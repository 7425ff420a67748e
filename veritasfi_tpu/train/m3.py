"""Multi-head contrastive training for the M3 encoder (dense + sparse +
ColBERT trained jointly).

BGE-M3 trains its three heads with multi-task InfoNCE plus
self-knowledge-distillation from the fused score; this trainer implements
the multi-task part — one jitted step computes all three in-batch score
matrices from ONE forward per side and sums their InfoNCE losses — which
is what the in-repo fixture needs: heads whose scores carry real ranking
signal so the candidate-stage fusion (retrieval/m3_scorer.py) can be
evaluated end to end without checkpoints (none ship in this image; with a
real local BGE-M3 checkpoint, models/m3_heads.py::load_m3_head_params
skips training entirely).

TPU shape: the in-batch sparse and ColBERT matrices are [B, B, Lq, Ld]
token-interaction tensors — at fixture sizes (B<=48, L<=64) tens of MB,
einsum-fused by XLA, nothing leaves the device but the scalar loss.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.m3_heads import M3Encoder
from .contrastive import info_nce


def sparse_score_matrix(q_ids, q_w, q_tok, d_ids, d_w, d_tok):
    """In-batch lexical-overlap scores [B, B]: query i vs document j =
    sum over i's token ids of w_q * (max matching w_d in j)."""
    eq = (q_ids[:, None, :, None] == d_ids[None, :, None, :])
    eq = eq & q_tok[:, None, :, None] & d_tok[None, :, None, :]
    d_match = jnp.max(jnp.where(eq, d_w[None, :, None, :], 0.0), axis=-1)
    return jnp.einsum("ql,qdl->qd", q_w, d_match)


def colbert_score_matrix(q_col, q_mask, d_col, d_mask):
    """In-batch late-interaction scores [B, B]: mean over query i's valid
    tokens of the max cosine against document j's valid tokens."""
    sim = jnp.einsum("qlc,dmc->qdlm", q_col, d_col,
                     preferred_element_type=jnp.float32)
    sim = jnp.where(d_mask[None, :, None, :], sim, -1e9)
    maxsim = jnp.max(sim, axis=-1)                        # [B, B, Lq]
    nq = jnp.maximum(q_mask.sum(-1), 1).astype(jnp.float32)
    return (jnp.where(q_mask[:, None, :], maxsim, 0.0).sum(-1)
            / nq[:, None])


class M3ContrastiveTrainer:
    """Fit an M3Encoder on (query, positive) pairs with in-batch
    negatives across all three heads."""

    def __init__(self, encoder: M3Encoder, learning_rate: float = 3e-3,
                 temperature: float = 0.05, total_steps: int = 200,
                 warmup_ratio: float = 0.1,
                 head_weights: Tuple[float, float, float] =
                 (1.0, 0.3, 1.0)) -> None:
        self.encoder = encoder
        schedule = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=learning_rate,
            warmup_steps=max(int(warmup_ratio * total_steps), 1),
            decay_steps=total_steps)
        self.optimizer = optax.adamw(schedule)
        self.opt_state = self.optimizer.init(encoder.params)
        module = encoder.module
        hw = head_weights

        def step(params, opt_state, q_ids, q_mask, q_sp, d_ids, d_mask,
                 d_sp):
            def loss_fn(p):
                qd, qw, qc, qt = module.apply(p, q_ids, q_mask, q_sp)
                dd, dw, dc, dt = module.apply(p, d_ids, d_mask, d_sp)
                l_dense = info_nce(qd, dd, temperature)
                s_sp = sparse_score_matrix(q_ids, qw, qt, d_ids, dw, dt)
                labels = jnp.arange(s_sp.shape[0])
                l_sparse = optax.softmax_cross_entropy_with_integer_labels(
                    s_sp, labels).mean()
                s_cb = colbert_score_matrix(qc, q_mask.astype(bool),
                                            dc, d_mask.astype(bool))
                l_col = optax.softmax_cross_entropy_with_integer_labels(
                    s_cb / temperature, labels).mean()
                loss = hw[0] * l_dense + hw[1] * l_sparse + hw[2] * l_col
                return loss, (l_dense, l_sparse, l_col)

            (loss, parts), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = self.optimizer.update(grads, opt_state,
                                                       params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, parts

        self._train_step = jax.jit(step, donate_argnums=(0, 1))
        self.step_count = 0

    def make_batch(self, pairs: List[Tuple[str, str]]):
        enc = self.encoder
        q_ids, q_mask = enc.tokenize_padded([q for q, _ in pairs])
        d_ids, d_mask = enc.tokenize_padded([d for _, d in pairs])
        return (q_ids, q_mask, enc._special_mask(q_ids),
                d_ids, d_mask, enc._special_mask(d_ids))

    def train_step(self, *batch) -> float:
        args = [jnp.asarray(a) for a in batch]
        (self.encoder.params, self.opt_state, loss,
         self._last_parts) = self._train_step(
            self.encoder.params, self.opt_state, *args)
        self.step_count += 1
        return float(loss)

    def fit(self, pairs: List[Tuple[str, str]], steps: int,
            batch_size: Optional[int] = None, seed: int = 0) -> List[float]:
        """Seeded shuffled epochs, remainder rolling into the next batch
        with in-batch-unique positives — the exact epoch discipline of
        ContrastiveTrainer.fit (see its comment), reimplemented over the
        6-tensor M3 batch."""
        rng = np.random.default_rng(seed)
        batch_size = min(batch_size or len(pairs), len(pairs))
        losses: List[float] = []
        order: List[int] = []
        while len(losses) < steps:
            take: List[int] = []
            deferred: List[int] = []
            while len(take) < batch_size:
                if not order:
                    order = list(rng.permutation(len(pairs)))
                    order.extend(deferred)
                    deferred = []
                idx = order.pop(0)
                if idx in take:
                    deferred.append(idx)
                    continue
                take.append(idx)
            order.extend(deferred)
            batch = self.make_batch([pairs[i] for i in take])
            losses.append(self.train_step(*batch))
        return losses
