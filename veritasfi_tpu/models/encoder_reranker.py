"""Encoder-class cross-encoder reranker (bge-reranker-base/large family).

The reference's production reranker is the LLM-based bge-reranker-v2-gemma
(models/reranker.py), but the BGE reranker family also ships encoder-class
cross-encoders (XLM-RoBERTa + 1-logit classification head) that are ~10x
cheaper per pair — BASELINE config #3 benchmarks exactly this
("bge-reranker-base scoring top-50 candidates per query, continuous
batching"). Same ``compute_score(pairs, batch_size)`` surface as
FlagReranker, so it is a drop-in scorer for the serving stack.
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .encoder import ENCODER_PRESETS, EncoderArch, encoder_trunk


RERANKER_ENCODER_PRESETS: Dict[str, EncoderArch] = {
    "tiny-test": ENCODER_PRESETS["tiny-test"],
    # BAAI/bge-reranker-base (XLM-RoBERTa base)
    "bge-reranker-base": EncoderArch(
        vocab_size=250002, hidden=768, layers=12, heads=12,
        intermediate=3072, max_positions=514, type_vocab=1, pad_id=1,
        pos_offset=2, layer_norm_eps=1e-5),
    # BAAI/bge-reranker-large (XLM-RoBERTa large)
    "bge-reranker-large": EncoderArch(
        vocab_size=250002, hidden=1024, layers=24, heads=16,
        intermediate=4096, max_positions=514, type_vocab=1, pad_id=1,
        pos_offset=2, layer_norm_eps=1e-5),
}


class FlaxCrossEncoderClassifier(nn.Module):
    """Encoder backbone + XLM-R classification head -> one relevance logit.

    Head layout matches XLMRobertaForSequenceClassification(num_labels=1):
    dense(hidden) -> tanh -> out_proj(1) on the CLS state.
    """

    arch: EncoderArch
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask):
        a = self.arch
        x, _ = encoder_trunk(a, self.dtype, input_ids, attention_mask)
        cls = x[..., 0, :].astype(jnp.float32)
        h = nn.Dense(a.hidden, dtype=jnp.float32, name="head_dense")(cls)
        h = jnp.tanh(h)
        return nn.Dense(1, dtype=jnp.float32, name="head_out")(h)[..., 0]


class EncoderReranker:
    """FlagReranker-compatible scorer on the encoder cross-encoder."""

    def __init__(
        self,
        preset: str = "tiny-test",
        arch: Optional[EncoderArch] = None,
        params: Optional[Any] = None,
        tokenizer=None,
        dtype: Any = jnp.float32,
        query_max_length: int = 512,
        passage_max_length: int = 1024,
        seed: int = 0,
    ) -> None:
        self.arch = arch or RERANKER_ENCODER_PRESETS[preset]
        self.module = FlaxCrossEncoderClassifier(self.arch, dtype=dtype)
        # clamp pair length to the position table (same guard as
        # TextEncoder): XLM-R rerankers have 514 positions with offset 2 —
        # rows longer than that would gather clamped position embeddings
        # and silently corrupt scores
        pos_cap = self.arch.max_positions - self.arch.pos_offset
        self.passage_max_length = min(passage_max_length, pos_cap)
        self.query_max_length = min(query_max_length,
                                    self.passage_max_length)
        if tokenizer is None:
            from .tokenizer import HashTokenizer

            tokenizer = HashTokenizer(self.arch.vocab_size,
                                      pad_id=self.arch.pad_id)
        self.tokenizer = tokenizer
        if params is None:
            ids = jnp.zeros((1, 16), jnp.int32)
            params = self.module.init(jax.random.PRNGKey(seed), ids,
                                      jnp.ones_like(ids))
        self.params = params
        self._rebuild_forwards()
        self._passage_cache: Dict[str, List[int]] = {}

    def quantize_mlp(self) -> "EncoderReranker":
        """Switch the backbone to the fused int8 MLP path in place
        (ops/int8_matmul.py::fused_int8_mlp): pre-quantizes the MLP kernels
        and rebuilds the jitted forwards. ~2 ms off a [50, 256]
        bge-reranker-base forward on v5e at 0.98 score correlation /
        10-of-10 top-10 overlap vs bf16 (measured); returns self."""
        import dataclasses

        from .encoder import quantize_mlp_params

        if self.arch.mlp_impl == "int8":
            return self
        self.arch = dataclasses.replace(self.arch, mlp_impl="int8")
        self.module = FlaxCrossEncoderClassifier(self.arch,
                                                 dtype=self.module.dtype)
        self.params = quantize_mlp_params(self.params)
        self._rebuild_forwards()
        return self

    def fuse_qkv(self) -> "EncoderReranker":
        """Switch the backbone to fused-QKV attention projections in place
        (one [hidden, 3*hidden] GEMM instead of three square GEMMs per
        layer); outputs are bit-identical — each output column's dot
        product is unchanged. Returns self."""
        import dataclasses

        from .encoder import fuse_qkv_params

        if self.arch.qkv_impl == "fused":
            return self
        self.arch = dataclasses.replace(self.arch, qkv_impl="fused")
        self.module = FlaxCrossEncoderClassifier(self.arch,
                                                 dtype=self.module.dtype)
        self.params = fuse_qkv_params(self.params)
        self._rebuild_forwards()
        return self

    def _rebuild_forwards(self) -> None:
        self._forward = jax.jit(self.module.apply)

        def _fwd_sim(params, ids, mask, emb):
            from ..ops.similarity import cosine_similarity_matrix

            logits = self.module.apply(params, ids, mask)
            return logits, cosine_similarity_matrix(emb)

        self._forward_sim = jax.jit(_fwd_sim)

    # -- tokenization -----------------------------------------------------
    def tokenize_passage(self, passage: str) -> List[int]:
        """Cached passage-side tokens (corpus texts are static; the host
        tokenizer is the only per-pair Python work in the hot path)."""
        ids = self._passage_cache.get(passage)
        if ids is None:
            hf = getattr(self.tokenizer, "hf", None)
            if hf is not None:
                ids = hf(passage, add_special_tokens=False,
                         truncation=True,
                         max_length=self.passage_max_length)["input_ids"]
            else:
                from .tokenizer import basic_tokens

                ids = [self.tokenizer.token_id(t)
                       for t in basic_tokens(passage)]
                ids = ids[: self.passage_max_length]
            self._passage_cache[passage] = ids
        return ids

    def pair_layout(self, query: str):
        """Canonical pair-row layout: (prefix, passage budget, suffix) with
        row = prefix + passage_tokens[:max(budget, 0)] + suffix. The ONE
        source of the [cls] q [sep] p [sep] framing — encode_pairs_cached
        and the fused serve path both call it, so they cannot drift."""
        hf = getattr(self.tokenizer, "hf", None)
        if hf is not None:
            q_ids = hf(query, add_special_tokens=False, truncation=True,
                       max_length=self.query_max_length)["input_ids"]
            cls_id = hf.cls_token_id if hf.cls_token_id is not None else 0
            sep_id = hf.sep_token_id if hf.sep_token_id is not None else 2
            # RoBERTa-family pair encoding uses DOUBLE separators between
            # the segments (<s> q </s></s> p </s>) — the format XLM-R
            # rerankers were trained on and what hf(query, passage) in
            # encode_pair emits; a single-sep framing scores differently
            mid = [sep_id, sep_id]
        else:
            from .tokenizer import basic_tokens

            q_ids = [self.tokenizer.token_id(t)
                     for t in basic_tokens(query)][: self.query_max_length]
            cls_id, sep_id = self.tokenizer.cls_id, self.tokenizer.sep_id
            mid = [sep_id]
        budget = self.passage_max_length - len(q_ids) - 2 - len(mid)
        return [cls_id] + list(q_ids) + mid, budget, [sep_id]

    def encode_pairs_cached(self, query: str,
                            passages: List[str]) -> List[List[int]]:
        """Pair rows with passage tokens served from the cache."""
        prefix, budget, suffix = self.pair_layout(query)
        rows = []
        for p in passages:
            p_ids = self.tokenize_passage(p)[: max(budget, 0)]
            rows.append(prefix + p_ids + suffix)
        return rows

    # -- fused scoring + similarity ----------------------------------------
    def score_and_sim(self, rows: List[List[int]], embeddings: np.ndarray
                      ) -> "tuple[np.ndarray, np.ndarray]":
        """One device call returning (relevance logits, pairwise cosine of
        the candidates' retrieval embeddings) — the two inputs of rerank
        fusion (vllmManager.py:450-462) without separate dispatches."""
        if not rows:
            return (np.zeros((0,), np.float32),
                    np.zeros((0, 0), np.float32))
        seq = max(len(r) for r in rows)
        # pad to a multiple of 64 (vs power-of-two): ~25% less wasted
        # compute at typical chunk lengths, bounded compile variants
        bucket = max(-(-seq // 64) * 64, 64)
        ids = np.full((len(rows), bucket), self.arch.pad_id, np.int32)
        mask = np.zeros((len(rows), bucket), np.int32)
        for i, r in enumerate(rows):
            ids[i, : len(r)] = r
            mask[i, : len(r)] = 1
        logits, sim = self._forward_sim(self.params, jnp.asarray(ids),
                                        jnp.asarray(mask),
                                        jnp.asarray(embeddings))
        logits, sim = jax.device_get((logits, sim))
        return np.asarray(logits, np.float32), np.asarray(sim, np.float32)

    def encode_pair(self, query: str, passage: str) -> List[int]:
        hf = getattr(self.tokenizer, "hf", None)
        if hf is not None:
            out = hf(query, passage, truncation=True,
                     max_length=self.passage_max_length)
            return out["input_ids"]
        return self.tokenizer.pair(query, passage, self.query_max_length,
                                   self.passage_max_length
                                   - self.query_max_length)

    def score_tokens(self, rows: List[List[int]]) -> np.ndarray:
        if not rows:
            return np.zeros((0,), np.float32)
        seq = max(len(r) for r in rows)
        # pad to a multiple of 64 (vs power-of-two): ~25% less wasted
        # compute at typical chunk lengths, bounded compile variants
        bucket = max(-(-seq // 64) * 64, 64)
        ids = np.full((len(rows), bucket), self.arch.pad_id, np.int32)
        mask = np.zeros((len(rows), bucket), np.int32)
        for i, r in enumerate(rows):
            ids[i, : len(r)] = r
            mask[i, : len(r)] = 1
        out = self._forward(self.params, jnp.asarray(ids), jnp.asarray(mask))
        return np.asarray(out, np.float32)

    def compute_score(self, pairs: List[List[str]],
                      batch_size: int = 8) -> List[float]:
        rows = [self.encode_pair(q, p) for q, p in pairs]
        scores: List[float] = []
        for i in range(0, len(rows), batch_size):
            scores.extend(self.score_tokens(rows[i: i + batch_size]).tolist())
        return scores


def load_encoder_reranker_params(state: Mapping[str, Any],
                                 arch: EncoderArch) -> Dict[str, Any]:
    """Map an XLMRobertaForSequenceClassification state dict onto
    FlaxCrossEncoderClassifier."""
    from .hf_loader import _np, load_bert_params

    body = load_bert_params(state, arch)["params"]

    def get(name: str) -> np.ndarray:
        return _np(state[name])

    body["head_dense"] = {"kernel": get("classifier.dense.weight").T,
                          "bias": get("classifier.dense.bias")}
    body["head_out"] = {"kernel": get("classifier.out_proj.weight").T,
                        "bias": get("classifier.out_proj.bias")}
    return {"params": body}
