"""Contrastive (InfoNCE) fine-tuning for the text encoder.

The reference trains only its reranker (train_bge_rr.sh); its embedder is
used frozen. This trainer closes the loop for the embedding side — the
same role BGE's own pretraining pipeline plays — and powers the in-repo
quality-parity fixture: a tiny encoder trained on the synthetic corpus
gives cosine ranking real semantics, so the pinned recall/NDCG goldens
actually move when retrieval breaks (they cannot with a random or lexical
embedder).

TPU-native loop: one jitted step embeds queries and documents with shared
weights, computes the in-batch similarity matrix on the MXU, and takes the
symmetric cross-entropy against the diagonal. Optionally data-parallel
over a mesh axis (batch sharded, params replicated; XLA inserts the
gradient psums).
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.encoder import TextEncoder


def info_nce(q_emb: jnp.ndarray, d_emb: jnp.ndarray,
             temperature: float) -> jnp.ndarray:
    """Symmetric InfoNCE over an in-batch similarity matrix. Embeddings are
    unit-norm (FlaxEncoder output), so logits are cosines / temperature."""
    logits = jnp.matmul(q_emb, d_emb.T,
                        preferred_element_type=jnp.float32) / temperature
    labels = jnp.arange(logits.shape[0])
    l_qd = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    l_dq = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
    return 0.5 * (l_qd.mean() + l_dq.mean())


class ContrastiveTrainer:
    """Fine-tune a TextEncoder on (query, positive document) pairs with
    in-batch negatives."""

    def __init__(
        self,
        encoder: TextEncoder,
        learning_rate: float = 3e-3,
        temperature: float = 0.05,
        total_steps: int = 200,
        warmup_ratio: float = 0.1,
        mesh: Optional[Mesh] = None,
        data_axis: str = "data",
    ) -> None:
        self.encoder = encoder
        self.temperature = temperature
        schedule = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=learning_rate,
            warmup_steps=max(int(warmup_ratio * total_steps), 1),
            decay_steps=total_steps)
        self.optimizer = optax.adamw(schedule)
        self.opt_state = self.optimizer.init(encoder.params)
        self.mesh = mesh
        self._batch_sharding = (NamedSharding(mesh, P(data_axis, None))
                                if mesh is not None else None)
        module = encoder.module

        def step(params, opt_state, q_ids, q_mask, d_ids, d_mask):
            def loss_fn(p):
                q = module.apply(p, q_ids, q_mask)
                d = module.apply(p, d_ids, d_mask)
                return info_nce(q, d, temperature)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.optimizer.update(grads, opt_state,
                                                       params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        self._train_step = jax.jit(step, donate_argnums=(0, 1))
        self.step_count = 0

    # ------------------------------------------------------------------
    def make_batch(self, pairs: List[Tuple[str, str]]):
        q_ids, q_mask = self.encoder.tokenize_padded([q for q, _ in pairs])
        d_ids, d_mask = self.encoder.tokenize_padded([d for _, d in pairs])
        return q_ids, q_mask, d_ids, d_mask

    def train_step(self, q_ids, q_mask, d_ids, d_mask) -> float:
        args = [jnp.asarray(a) for a in (q_ids, q_mask, d_ids, d_mask)]
        if self._batch_sharding is not None:
            args = [jax.device_put(a, self._batch_sharding) for a in args]
        self.encoder.params, self.opt_state, loss = self._train_step(
            self.encoder.params, self.opt_state, *args)
        self.step_count += 1
        return float(loss)

    def fit(self, pairs: List[Tuple[str, str]], steps: int,
            batch_size: Optional[int] = None, seed: int = 0) -> List[float]:
        """Seeded epochs over ``pairs`` (shuffled each epoch) for ``steps``
        batches; returns the loss trace. Deterministic for fixed inputs —
        the quality-parity goldens depend on it."""
        rng = np.random.default_rng(seed)
        batch_size = min(batch_size or len(pairs), len(pairs))
        losses: List[float] = []
        order: List[int] = []
        while len(losses) < steps:
            # consume each epoch's permutation fully — the remainder of an
            # epoch rolls into the next batch instead of being dropped
            # (dropping would systematically under-train len(pairs) %
            # batch_size shuffled-out samples). A batch spanning the epoch
            # boundary defers indices it already holds to the next epoch's
            # far end, so in-batch positives stay unique (duplicate
            # positives would corrupt the in-batch-negative labels).
            # Identical pop sequence to the old code when batch_size
            # divides len(pairs) — the quality goldens depend on that.
            take: List[int] = []
            while len(take) < batch_size:
                if not order:
                    order = list(rng.permutation(len(pairs)))
                i = order.pop()
                if i in take:
                    order.insert(0, i)
                    continue
                take.append(i)
            batch = [pairs[i] for i in take]
            losses.append(self.train_step(*self.make_batch(batch)))
        return losses
