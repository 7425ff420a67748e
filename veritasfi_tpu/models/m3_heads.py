"""BGE-M3-style multi-head encoder: dense + sparse + ColBERT from ONE
trunk forward.

The reference embeds with BGE-M3 but uses only its DENSE head
(reference: config/example.yaml:3, src/utils/faissRetriever.py:33 — the
FAISS index stores one vector per chunk). The checkpoint it loads also
carries two more heads the reference throws away:

  * sparse  — a per-token scalar ``relu(W_s h_t)``: a learned lexical
    weight over the vocabulary (SPLADE-style), scoring by weighted
    token-id overlap;
  * ColBERT — a per-token vector ``normalize(W_c h_t)``: late
    interaction, scoring by sum of per-query-token max similarities.

This module implements all three heads over the repo's encoder trunk so
the ensemble can fuse them at the CANDIDATE stage (retrieval/m3_scorer.py)
— a beyond-reference quality lever the reference's own embedder already
paid the FLOPs for.

TPU-first shape of the design:
  * one trunk forward serves all heads — the heads are two extra GEMMs
    on the [B, L, H] hidden states, fused by XLA into the same program;
  * scoring happens on CANDIDATES (tens of rows), not the corpus: the
    corpus-side token representations are computed once at ingest and
    kept device-resident, and one jitted program gathers candidate rows
    and computes all three scores without materializing anything
    [N, ...]-shaped (see m3_scorer.py);
  * per-token outputs are bf16-friendly and length-bucketed by the same
    ``tokenize_padded`` every other consumer uses.

Weight loading: ``load_m3_head_params`` maps a local BGE-M3 checkpoint's
``sparse_linear.weight`` / ``colbert_linear.weight`` (FlagEmbedding
layout) onto this module; with no checkpoint in the image the heads are
trained in-repo by ``train/m3.py`` (the quality fixture's technique).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .encoder import ENCODER_PRESETS, EncoderArch, encoder_trunk


@dataclass(frozen=True)
class M3Arch:
    """Trunk arch + head dims. ``colbert_dim`` is 1024 for real BGE-M3
    (colbert_linear: hidden -> hidden); smaller for in-repo fixtures."""

    trunk: EncoderArch
    colbert_dim: int = 64


M3_PRESETS: Dict[str, M3Arch] = {
    "tiny-test": M3Arch(trunk=ENCODER_PRESETS["tiny-test"], colbert_dim=32),
    # BAAI/bge-m3: XLM-R-large trunk, colbert_linear 1024 -> 1024
    "bge-m3": M3Arch(trunk=ENCODER_PRESETS["bge-m3"], colbert_dim=1024),
}


class FlaxM3Encoder(nn.Module):
    """Trunk + three heads. Returns (dense [B, H], sparse [B, L],
    colbert [B, L, dc], token_mask [B, L]).

    * dense: CLS pooled, L2-normalized, f32 (identical formula to
      FlaxEncoder with pooling='cls' — the dense head IS the reference's
      embedding).
    * sparse: relu of a scalar projection per token, f32, zeroed on pad
      AND on the CLS/SEP specials (FlagEmbedding drops specials from the
      lexical weights; a weight on [CLS] would match every document).
    * colbert: per-token projection, L2-normalized, zeroed on pad; the
      CLS position is KEPT (FlagEmbedding's colbert_vecs use the full
      masked sequence).
    ``token_mask`` marks positions that carry sparse weight.
    """

    arch: M3Arch
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask, special_mask):
        a = self.arch.trunk
        x, mask = encoder_trunk(a, self.dtype, input_ids, attention_mask)

        dense = x[..., 0, :].astype(jnp.float32)
        dense = dense / jnp.maximum(
            jnp.linalg.norm(dense, axis=-1, keepdims=True), 1e-12)

        token_mask = mask & ~special_mask.astype(bool)
        sparse = nn.Dense(1, name="sparse_linear", dtype=self.dtype)(x)
        sparse = jax.nn.relu(sparse[..., 0].astype(jnp.float32))
        sparse = jnp.where(token_mask, sparse, 0.0)

        col = nn.Dense(self.arch.colbert_dim, name="colbert_linear",
                       dtype=self.dtype)(x).astype(jnp.float32)
        col = col / jnp.maximum(
            jnp.linalg.norm(col, axis=-1, keepdims=True), 1e-12)
        col = jnp.where(mask[..., None], col, 0.0)
        return dense, sparse, col, token_mask


@dataclass
class M3Embeddings:
    """Host-side multi-head encodings for a batch of texts, padded to one
    length bucket. ``ids`` rows are the tokenizer's ids with pad at
    ``pad_id``; sparse weights and colbert vectors align positionally."""

    dense: np.ndarray      # [B, H] f32, unit rows
    ids: np.ndarray        # [B, L] int32
    sparse: np.ndarray     # [B, L] f32 (0 on pad/specials)
    colbert: np.ndarray    # [B, L, dc] f32, unit rows where valid
    mask: np.ndarray       # [B, L] bool — colbert validity
    token_mask: np.ndarray  # [B, L] bool — sparse validity


def dedup_sparse_by_id(ids: np.ndarray, sparse: np.ndarray,
                       token_mask: np.ndarray) -> np.ndarray:
    """Per row, keep each token ID's weight only at its FIRST occurrence
    (at the max over occurrences), zeroing the rest — the query-side
    M3/SPLADE convention where the lexical representation is a map
    {token_id: weight}, not a positional sequence. Without this a query
    that repeats a token would double-count every match."""
    out = sparse.copy()
    for b in range(ids.shape[0]):
        seen: Dict[int, int] = {}
        for j in range(ids.shape[1]):
            if not token_mask[b, j]:
                continue
            tid = int(ids[b, j])
            if tid in seen:
                k = seen[tid]
                out[b, k] = max(out[b, k], out[b, j])
                out[b, j] = 0.0
            else:
                seen[tid] = j
    return out


class M3Encoder:
    """Host-facing multi-head encoder wrapper (the M3 sibling of
    TextEncoder): texts -> M3Embeddings via one jitted forward."""

    def __init__(self, preset: str = "tiny-test",
                 arch: Optional[M3Arch] = None,
                 params: Optional[Any] = None,
                 tokenizer: Optional[Callable] = None,
                 dtype: Any = jnp.float32,
                 max_length: int = 512, seed: int = 0) -> None:
        self.arch = arch or M3_PRESETS[preset]
        trunk = self.arch.trunk
        self.max_length = min(max_length,
                              trunk.max_positions - trunk.pos_offset)
        self.module = FlaxM3Encoder(self.arch, dtype=dtype)
        if tokenizer is None:
            from .tokenizer import HashTokenizer

            tokenizer = HashTokenizer(trunk.vocab_size, pad_id=trunk.pad_id)
        self.tokenizer = tokenizer
        # ids the sparse head must ignore (pad is masked already):
        # HashTokenizer exposes cls_id/sep_id; an HF wrapper
        # (tokenizer.load_hf_tokenizer) exposes the underlying tokenizer
        # as .hf — XLM-R uses bos/eos (<s>/</s>) as its CLS/SEP
        cand = {getattr(tokenizer, "cls_id", None),
                getattr(tokenizer, "sep_id", None)}
        hf = getattr(tokenizer, "hf", None)
        if hf is not None:
            cand |= {hf.cls_token_id, hf.sep_token_id,
                     hf.bos_token_id, hf.eos_token_id}
        self.special_ids = tuple(sorted(
            c for c in cand if c is not None and c >= 0))
        if params is None:
            ids = jnp.zeros((1, 16), jnp.int32)
            params = self.module.init(jax.random.PRNGKey(seed), ids,
                                      jnp.ones_like(ids),
                                      jnp.zeros_like(ids))
        self.params = params
        self._forward = jax.jit(self.module.apply)

    @property
    def dim(self) -> int:
        return self.arch.trunk.hidden

    def tokenize_padded(self, texts: List[str]):
        """Same bucketing contract as TextEncoder.tokenize_padded."""
        from .encoder import _bucket_length

        batch = self.tokenizer(texts, self.max_length)
        seq = batch["input_ids"].shape[1]
        bucket = _bucket_length(seq, self.max_length)
        pad = bucket - seq
        ids = np.pad(batch["input_ids"], ((0, 0), (0, pad)),
                     constant_values=self.arch.trunk.pad_id)
        mask = np.pad(batch["attention_mask"], ((0, 0), (0, pad)))
        return ids.astype(np.int32), mask.astype(np.int32)

    def _special_mask(self, ids: np.ndarray) -> np.ndarray:
        sm = np.zeros(ids.shape, np.int32)
        for sid in self.special_ids:
            sm |= (ids == sid)
        return sm

    def encode_multi(self, texts: List[str],
                     dedup_query_ids: bool = False) -> M3Embeddings:
        """All heads for ``texts``. ``dedup_query_ids=True`` applies the
        query-side {token_id: weight} dedup (see dedup_sparse_by_id)."""
        if not texts:
            h, dc = self.dim, self.arch.colbert_dim
            z = np.zeros((0, 0))
            return M3Embeddings(np.zeros((0, h), np.float32),
                                z.astype(np.int32), z.astype(np.float32),
                                np.zeros((0, 0, dc), np.float32),
                                z.astype(bool), z.astype(bool))
        ids, mask = self.tokenize_padded(texts)
        special = self._special_mask(ids)
        dense, sparse, col, tok = self._forward(
            self.params, jnp.asarray(ids), jnp.asarray(mask),
            jnp.asarray(special))
        dense, sparse, col, tok = (np.asarray(dense, np.float32),
                                   np.asarray(sparse, np.float32),
                                   np.asarray(col, np.float32),
                                   np.asarray(tok, bool))
        if dedup_query_ids:
            sparse = dedup_sparse_by_id(ids, sparse, tok)
        return M3Embeddings(dense=dense, ids=ids, sparse=sparse,
                            colbert=col, mask=mask.astype(bool),
                            token_mask=tok)

    # dense-only view (drop-in for TextEncoder.encode / embed_fn slots)
    def encode(self, texts: List[str]) -> np.ndarray:
        return self.encode_multi(texts).dense


def load_m3_encoder_from_dir(path: str, max_length: Optional[int] = None,
                             dtype: Any = None) -> "M3Encoder":
    """Build an M3Encoder from a local BGE-M3 checkpoint directory — the
    one-call real-weight path (RECIPES.md). FlagEmbedding ships the trunk
    as a standard HF XLM-R checkpoint plus two small head files
    (``sparse_linear.pt`` / ``colbert_linear.pt``); some re-exports fold
    the head tensors into the main state dict instead — both layouts are
    handled. colbert_dim is read from the checkpoint, not guessed."""
    import json as _json

    from .hf_loader import _load_state_dict, load_bert_params
    from .tokenizer import load_hf_tokenizer

    with open(os.path.join(path, "config.json")) as f:
        cfg = _json.load(f)
    trunk = EncoderArch(
        vocab_size=cfg["vocab_size"],
        hidden=cfg["hidden_size"],
        layers=cfg["num_hidden_layers"],
        heads=cfg["num_attention_heads"],
        intermediate=cfg["intermediate_size"],
        max_positions=cfg["max_position_embeddings"],
        type_vocab=cfg.get("type_vocab_size", 2),
        pad_id=cfg.get("pad_token_id", 0),
        pos_offset=2 if cfg.get("model_type") in ("roberta", "xlm-roberta")
        else 0,
        layer_norm_eps=cfg.get("layer_norm_eps", 1e-12),
        pooling="cls",
    )
    state = dict(_load_state_dict(path))
    trunk_params = load_bert_params(state, trunk)

    head_state: Dict[str, np.ndarray] = {}
    for head in ("sparse_linear", "colbert_linear"):
        if f"{head}.weight" in state:
            for suffix in ("weight", "bias"):
                if f"{head}.{suffix}" in state:
                    head_state[f"{head}.{suffix}"] = np.asarray(
                        state[f"{head}.{suffix}"], np.float32)
        else:
            pt = os.path.join(path, f"{head}.pt")
            if not os.path.exists(pt):
                raise FileNotFoundError(
                    f"{head} weights not found: neither '{head}.weight' in "
                    f"the state dict nor {pt} — is {path} a BGE-M3 "
                    f"checkpoint?")
            import torch

            sub = torch.load(pt, map_location="cpu", weights_only=True)
            for suffix in ("weight", "bias"):
                if suffix in sub:
                    head_state[f"{head}.{suffix}"] = np.asarray(
                        sub[suffix].float().numpy(), np.float32)
    colbert_dim = int(head_state["colbert_linear.weight"].shape[0])
    params = load_m3_head_params(trunk_params, head_state, colbert_dim)
    kw: Dict[str, Any] = {}
    if max_length is not None:
        kw["max_length"] = max_length
    if dtype is not None:
        kw["dtype"] = dtype
    return M3Encoder(arch=M3Arch(trunk=trunk, colbert_dim=colbert_dim),
                     params=params, tokenizer=load_hf_tokenizer(path), **kw)


def load_m3_head_params(trunk_params: Any, state: Dict[str, np.ndarray],
                        colbert_dim: int) -> Any:
    """Graft a FlagEmbedding BGE-M3 checkpoint's head weights onto a trunk
    param tree loaded by ``hf_loader.load_bert_params``. FlagEmbedding
    saves ``sparse_linear.weight [1, H]`` / ``colbert_linear.weight
    [dc, H]`` (+ biases) in separate files next to the trunk; flax Dense
    kernels are the transpose."""
    def lin(prefix: str, out_dim: int) -> Dict[str, np.ndarray]:
        w = np.asarray(state[f"{prefix}.weight"], np.float32)
        if w.shape[0] != out_dim:
            raise ValueError(f"{prefix}.weight has shape {w.shape}, "
                             f"expected [{out_dim}, hidden]")
        p = {"kernel": w.T}
        if f"{prefix}.bias" in state:
            p["bias"] = np.asarray(state[f"{prefix}.bias"], np.float32)
        return p

    params = jax.tree.map(lambda x: x, trunk_params)  # shallow-ish copy
    params["params"]["sparse_linear"] = lin("sparse_linear", 1)
    params["params"]["colbert_linear"] = lin("colbert_linear", colbert_dim)
    return params
