"""LoRA fine-tuning of the cross-encoder reranker on a device mesh.

Capability parity with the reference's reranker training (reference:
experiments/reranker/training/train_bge_rr.sh:7-39 — torchrun ->
FlagEmbedding decoder-only reranker fine-tune, LoRA r=32 alpha=64 on
q/k/v/o_proj, train_group_size=8 meaning 1 positive + 7 negatives per
query, 'A: {query}' / 'B: {passage}' format with max lengths 512/1024,
lr 1e-4, bf16, warmup 0.1, weight decay 0.1, checkpoints every 100 steps).
This supports the README's two-stage strategy (general-domain then
company-specific, reference README.md:24-27): run once on anonymized
general data (``anonymize_company``), then resume on company data.

TPU-native training loop: the group-contrastive loss (cross-entropy of the
positive's yes-logit over the group) is jitted with pjit over a
('data', 'model') mesh — batch sharded over 'data', attention/MLP weights
sharded over 'model', LoRA adapters replicated; XLA inserts the ICI
collectives (vs torchrun/NCCL DDP in the reference). Only LoRA params
receive gradients; base weights are frozen. Checkpoints via orbax.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.reranker import CrossEncoderReranker, DecoderArch, FlaxDecoderLM


@dataclass
class LoRATrainConfig:
    learning_rate: float = 1e-4       # train_bge_rr.sh:33
    weight_decay: float = 0.1         # train_bge_rr.sh:37
    warmup_ratio: float = 0.1         # train_bge_rr.sh:36
    total_steps: int = 1000
    group_size: int = 8               # train_bge_rr.sh:18 (1 pos + 7 negs)
    query_max_length: int = 512       # train_bge_rr.sh:20
    passage_max_length: int = 1024    # train_bge_rr.sh:21
    save_every: int = 100             # train_bge_rr.sh:38
    seed: int = 0
    # True = reference behavior (only LoRA adapters get gradients,
    # train_bge_rr.sh:26-28). False = full fine-tune — needed when the
    # base is randomly initialized (no pretrained weights in the image):
    # a low-rank perturbation of random weights plateaus on tasks that
    # require token binding (measured on the quality fixture).
    lora_only: bool = True


def anonymize_company(text: str, company: str = "Zeekr",
                      replacement: str = "the Company") -> str:
    """Stage-1 general-domain data preparation: strip the company identity
    (the reference trains stage 1 on anonymized data, README.md:24-27)."""
    import re

    return re.sub(rf"(?i){re.escape(company)}(?:'s)?", replacement, text)


def group_loss(yes_logits: jnp.ndarray, group_size: int) -> jnp.ndarray:
    """Contrastive loss over groups: [B*G] yes-logits, positive at slot 0 of
    each group -> mean cross-entropy of slot 0 over the group."""
    groups = yes_logits.reshape(-1, group_size)
    logprobs = jax.nn.log_softmax(groups, axis=-1)
    return -logprobs[:, 0].mean()


def param_sharding_rules(path: Tuple[str, ...], leaf,
                         mesh: Mesh, model_axis: str = "model") -> NamedSharding:
    """Tensor-parallel layout for FlaxDecoderLM params:
    column-parallel q/k/v/gate/up, row-parallel o/down, vocab-sharded
    embedding, replicated norms and LoRA adapters."""
    names = set(path)
    spec = P()
    if "embed_tokens" in names:
        spec = P(model_axis, None)            # vocab-sharded (tied LM head)
    elif "lora_a" in names or "lora_b" in names:
        spec = P()                            # adapters replicated
    elif {"q_proj", "k_proj", "v_proj", "gate_proj", "up_proj"} & names:
        if "kernel" in names:
            spec = P(None, model_axis)        # column parallel
    elif {"o_proj", "down_proj"} & names:
        if "kernel" in names:
            spec = P(model_axis, None)        # row parallel
    return NamedSharding(mesh, spec)


def shard_params(params, mesh: Mesh, model_axis: str = "model"):
    def place(path, leaf):
        names = tuple(getattr(k, "key", str(k)) for k in path)
        return jax.device_put(leaf, param_sharding_rules(names, leaf, mesh,
                                                         model_axis))

    return jax.tree_util.tree_map_with_path(place, params)


def merge_base_params(init_params, base_params) -> Any:
    """Overlay pretrained base weights onto a fresh init tree, keeping the
    init's LoRA adapters. ``load_gemma_params`` trees carry no lora_a/b
    leaves — using them verbatim would make module.apply raise
    ScopeParamNotFoundError and leave _lora_mask with nothing trainable."""
    base_flat = {
        tuple(getattr(k, "key", str(k)) for k in path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(
            base_params)[0]}
    consumed = set()

    def pick(path, leaf):
        names = tuple(getattr(k, "key", str(k)) for k in path)
        # LoRA-wrapped modules nest the frozen kernel under a 'base' scope
        # (…/q_proj/base/kernel); a non-LoRA source tree stores it at
        # …/q_proj/kernel — accept either
        for key in (names, tuple(n for n in names if n != "base")):
            if key in base_flat:
                consumed.add(key)
                return base_flat[key]
        return leaf

    merged = jax.tree_util.tree_map_with_path(pick, init_params)
    unused = set(base_flat) - consumed
    if unused:
        raise ValueError(
            f"base_params leaves not present in the model: "
            f"{sorted(unused)[:5]}{'...' if len(unused) > 5 else ''}")
    return merged


def _lora_mask(params) -> Any:
    """True for trainable (LoRA) leaves, False for frozen base weights."""
    def mark(path, leaf):
        names = {getattr(k, "key", str(k)) for k in path}
        return bool({"lora_a", "lora_b"} & names)

    return jax.tree_util.tree_map_with_path(mark, params)


class RerankerTrainer:
    def __init__(
        self,
        arch: Optional[DecoderArch] = None,
        config: LoRATrainConfig = LoRATrainConfig(),
        mesh: Optional[Mesh] = None,
        base_params: Optional[Any] = None,
        tokenizer=None,
        data_axis: str = "data",
        model_axis: str = "model",
        dtype: Any = jnp.float32,
    ) -> None:
        if arch is None:
            arch = DecoderArch()
        if arch.lora_rank == 0:
            arch = dataclasses.replace(arch, lora_rank=32, lora_alpha=64.0)
        self.arch = arch
        self.config = config
        self.mesh = mesh
        self.data_axis = data_axis
        self.model_axis = model_axis
        self.module = FlaxDecoderLM(arch, dtype=dtype)
        self.reranker = CrossEncoderReranker(
            arch=arch, params=None, tokenizer=tokenizer,
            query_max_length=config.query_max_length,
            passage_max_length=config.passage_max_length, dtype=dtype,
            seed=config.seed)
        if base_params is not None:
            # pretrained base (e.g. hf_loader.load_gemma_params) + fresh
            # LoRA adapters from the init
            self.reranker.params = merge_base_params(
                self.reranker.params, base_params)
        self.params = self.reranker.params
        self.yes_id = self.reranker.yes_id

        schedule = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=config.learning_rate,
            warmup_steps=max(int(config.warmup_ratio * config.total_steps), 1),
            decay_steps=config.total_steps)
        if config.lora_only:
            labels = jax.tree_util.tree_map(
                lambda m: "train" if m else "freeze",
                _lora_mask(self.params))
        else:
            labels = jax.tree_util.tree_map(lambda _: "train", self.params)
        self.optimizer = optax.multi_transform(
            {"train": optax.adamw(schedule, weight_decay=config.weight_decay),
             "freeze": optax.set_to_zero()},
            labels)
        self.opt_state = self.optimizer.init(self.params)
        self.step_count = 0

        if mesh is not None:
            self.params = shard_params(self.params, mesh, model_axis)
            batch_sharding = NamedSharding(mesh, P(data_axis, None))
            self._batch_shardings = (batch_sharding, batch_sharding)
        else:
            self._batch_shardings = None
        self._train_step = jax.jit(self._step_fn, donate_argnums=(0, 1))

    # ------------------------------------------------------------------
    def _step_fn(self, params, opt_state, input_ids, attention_mask):
        group_size = self.config.group_size

        def loss_fn(p):
            logits = self.module.apply(
                p, input_ids, attention_mask,
                logit_ids=jnp.asarray([self.yes_id]))
            last = jnp.maximum(attention_mask.sum(axis=-1) - 1, 0)
            yes = logits[jnp.arange(logits.shape[0]), last, 0]
            return group_loss(yes, group_size)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    # ------------------------------------------------------------------
    def encode_group(self, query: str, passages: List[str]
                     ) -> List[List[int]]:
        """Token rows for one group: positive first, then negatives
        ('A: q' / 'B: p' format, stress_test.py:97-131)."""
        return [self.reranker.encode_pair(query, p) for p in passages]

    def make_batch(self, groups: List[Tuple[str, List[str]]],
                   pad_to: Optional[int] = None
                   ) -> Tuple[np.ndarray, np.ndarray]:
        rows: List[List[int]] = []
        for query, passages in groups:
            assert len(passages) == self.config.group_size
            rows.extend(self.encode_group(query, passages))
        seq = max(len(r) for r in rows)
        if pad_to:
            seq = max(seq, pad_to)
        seq = 1 << max(4, (seq - 1).bit_length())
        ids = np.full((len(rows), seq), self.arch.pad_id, np.int32)
        mask = np.zeros((len(rows), seq), np.int32)
        for i, r in enumerate(rows):
            ids[i, : len(r)] = r
            mask[i, : len(r)] = 1
        return ids, mask

    def train_step(self, input_ids: np.ndarray,
                   attention_mask: np.ndarray) -> float:
        ids = jnp.asarray(input_ids)
        mask = jnp.asarray(attention_mask)
        if self._batch_shardings is not None:
            ids = jax.device_put(ids, self._batch_shardings[0])
            mask = jax.device_put(mask, self._batch_shardings[1])
        self.params, self.opt_state, loss = self._train_step(
            self.params, self.opt_state, ids, mask)
        # keep the embedded reranker scoring with the CURRENT weights
        # (mid-training eval through trainer.reranker was step-0 otherwise)
        self.reranker.params = self.params
        self.step_count += 1
        return float(loss)

    def fit(self, data: Iterable[List[Tuple[str, List[str]]]],
            checkpoint_dir: Optional[str] = None) -> List[float]:
        losses = []
        for batch_groups in data:
            ids, mask = self.make_batch(batch_groups)
            losses.append(self.train_step(ids, mask))
            if (checkpoint_dir and self.config.save_every
                    and self.step_count % self.config.save_every == 0):
                self.save_checkpoint(checkpoint_dir)
        return losses

    # ------------------------------------------------------------------
    def save_checkpoint(self, directory: str) -> str:
        import os

        import orbax.checkpoint as ocp

        path = f"{directory}/step_{self.step_count}"
        if os.path.exists(path):
            # fit()'s periodic save and a caller's final save can land on
            # the same step; orbax refuses to overwrite — same state anyway
            return path
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(path, {"params": self.params,
                              "opt_state": self.opt_state,
                              "step": self.step_count})
        return path

    def restore_checkpoint(self, path: str) -> None:
        import orbax.checkpoint as ocp

        with ocp.PyTreeCheckpointer() as ckptr:
            restored = ckptr.restore(path)
        self.params = restored["params"]
        if self.mesh is not None:
            # re-establish the tensor-parallel layout (restored leaves are
            # plain host arrays)
            self.params = shard_params(self.params, self.mesh,
                                       self.model_axis)
        if "opt_state" in restored:
            self.opt_state = jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(self.opt_state),
                jax.tree_util.tree_leaves(restored["opt_state"]))
        else:   # pre-opt_state checkpoint: fresh moments, warn via reset
            self.opt_state = self.optimizer.init(self.params)
        self.reranker.params = self.params
        self.step_count = int(
            np.asarray(restored["step"]))
