"""BGE-class text encoder as a Flax module.

TPU-native replacement for the reference's HuggingFaceEmbeddings(BGE-M3)
PyTorch encoder (reference: src/utils/ragManager.py:50,
faissRetriever.py:33): a BERT/XLM-R-family bidirectional transformer with
CLS (or mean) pooling and L2 normalization.

Architecture presets cover the BGE family:
  * bge-small/base/large-en-v1.5 — BERT encoders, CLS pooling;
  * bge-m3 — XLM-RoBERTa-large (position offset 2, single token type).

Weights can be converted from a local HuggingFace PyTorch checkpoint with
``models.hf_loader.load_bert_params``; otherwise the encoder initializes
randomly (architecture-faithful, used for benchmarking and tests).

Compute: bf16 activations with fp32 layernorm/softmax accumulation;
sequence lengths bucketed to bound recompiles; whole-batch forwards map to
the MXU.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclass(frozen=True)
class EncoderArch:
    vocab_size: int = 30522
    hidden: int = 384
    layers: int = 12
    heads: int = 12
    intermediate: int = 1536
    max_positions: int = 512
    type_vocab: int = 2
    pad_id: int = 0
    pos_offset: int = 0           # 2 for (XLM-)RoBERTa position numbering
    layer_norm_eps: float = 1e-12
    pooling: str = "cls"          # cls | mean
    # performance knobs:
    #  * attn_impl "pallas" = single-kernel VMEM-resident attention
    #    (ops/pallas_attention.py); numerics match xla to ~1e-4.
    #  * gelu_impl "tanh" = tanh-approximate gelu. On this TPU the erf
    #    lowering costs ~5 ms per [50,256,3072]x12 forward vs ~0.6 ms for
    #    tanh (measured); |tanh-erf| <= 1e-3 on O(1) inputs, at the bf16
    #    rounding floor. "erf" matches HF exactly (default).
    attn_impl: str = "xla"        # xla | pallas
    gelu_impl: str = "erf"        # erf | tanh
    #  * mlp_impl "int8" routes each layer's WHOLE MLP (up-GEMM + gelu +
    #    down-GEMM) through one fused int8 Pallas kernel with pre-quantized
    #    weights (ops/int8_matmul.py::fused_int8_mlp): the MXU runs at its
    #    int8 rate (1.47x bf16 measured) and the [*, intermediate]
    #    activation never leaves VMEM. ~1e-2 relative score error from
    #    double dynamic quantization; "xla" (exact) stays the default —
    #    parity surfaces keep f32/bf16 numerics.
    mlp_impl: str = "xla"         # xla | int8
    #  * qkv_impl "fused" computes Q, K, V as ONE [hidden, 3*hidden] GEMM
    #    (then splits) instead of three [hidden, hidden] GEMMs — 3x fewer
    #    matmul dispatches per layer and one weight-tile load; bit-exact
    #    reassociation-free numerics vs split (same per-output dot). Use
    #    ``fuse_qkv_params`` to convert split checkpoints.
    qkv_impl: str = "split"       # split | fused


ENCODER_PRESETS: Dict[str, EncoderArch] = {
    # tiny config for tests
    "tiny-test": EncoderArch(vocab_size=1024, hidden=64, layers=2, heads=2,
                             intermediate=128, max_positions=128),
    # BAAI/bge-small-en-v1.5
    "bge-small-en": EncoderArch(hidden=384, layers=12, heads=12, intermediate=1536),
    # BAAI/bge-base-en-v1.5
    "bge-base-en": EncoderArch(hidden=768, layers=12, heads=12, intermediate=3072),
    # BAAI/bge-large-en-v1.5
    "bge-large-en": EncoderArch(hidden=1024, layers=24, heads=16, intermediate=4096),
    # BAAI/bge-m3 (XLM-RoBERTa-large backbone; dense embedding = CLS)
    "bge-m3": EncoderArch(vocab_size=250002, hidden=1024, layers=24, heads=16,
                          intermediate=4096, max_positions=8194, type_vocab=1,
                          pad_id=1, pos_offset=2, layer_norm_eps=1e-5),
}


class _SelfAttention(nn.Module):
    arch: EncoderArch
    dtype: Any

    @nn.compact
    def __call__(self, x, mask):
        a = self.arch
        head_dim = a.hidden // a.heads
        if a.qkv_impl == "fused":
            qkv = nn.Dense(3 * a.hidden, dtype=self.dtype,
                           name="qkv")(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(*x.shape[:-1], a.heads, head_dim)
            k = k.reshape(*x.shape[:-1], a.heads, head_dim)
            v = v.reshape(*x.shape[:-1], a.heads, head_dim)
        else:
            dense = lambda name: nn.Dense(a.hidden, dtype=self.dtype,
                                          name=name)
            q = dense("query")(x).reshape(*x.shape[:-1], a.heads, head_dim)
            k = dense("key")(x).reshape(*x.shape[:-1], a.heads, head_dim)
            v = dense("value")(x).reshape(*x.shape[:-1], a.heads, head_dim)
        if a.attn_impl == "pallas":
            # single-kernel VMEM-resident attention (masks are contiguous
            # prefixes — right-padded tokenization throughout this package)
            from ..ops.pallas_attention import short_seq_mha

            lengths = mask.astype(jnp.int32).sum(axis=-1)
            ctx = short_seq_mha(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), lengths,
                interpret=jax.default_backend() != "tpu")
            ctx = ctx.transpose(0, 2, 1, 3)
        else:
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            scores = scores / math.sqrt(head_dim)
            neg = jnp.finfo(jnp.float32).min
            scores = jnp.where(mask[:, None, None, :], scores, neg)
            probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        ctx = ctx.reshape(*x.shape[:-1], a.hidden)
        return nn.Dense(a.hidden, dtype=self.dtype, name="out")(ctx)


class _Int8DenseParams(nn.Module):
    """Param container for one pre-quantized Dense (kernel_q int8 [K, N] +
    per-column scale f32 [1, N] + bias [N]) — the layout written by
    ``quantize_mlp_params``. The compute itself runs in the FUSED int8 MLP
    kernel (ops/int8_matmul.py::fused_int8_mlp), not per-GEMM: two separate
    pallas calls per layer lose the MXU gain to fusion barriers (see the
    STATUS note in ops/int8_matmul.py)."""

    k_in: int
    features: int

    @nn.compact
    def __call__(self):
        kernel_q = self.param(
            "kernel_q",
            lambda rng, shape: jnp.zeros(shape, jnp.int8),
            (self.k_in, self.features))
        scale = self.param("scale", nn.initializers.ones,
                           (1, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel_q, scale, bias


def quantize_mlp_params(params):
    """Convert a standard (f32/bf16) encoder param tree to the
    mlp_impl='int8' layout: each layer's intermediate/output Dense kernel
    becomes (kernel_q int8, scale). Everything else passes through, so
    HF-converted or trained checkpoints serve quantized unchanged."""
    from ..ops.int8_matmul import quantize_weight

    from collections.abc import Mapping

    def walk(node):
        if isinstance(node, Mapping):
            out = {}
            for name, sub in node.items():
                # Mapping, not dict: flax FrozenDict trees must quantize
                # too (a dict-only gate silently skips them and the int8
                # module then fails on the missing 'kernel_q')
                if (name in ("intermediate", "output")
                        and isinstance(sub, Mapping) and "kernel" in sub):
                    w8, sw = quantize_weight(sub["kernel"])
                    out[name] = {"kernel_q": w8, "scale": sw,
                                 "bias": sub["bias"]}
                else:
                    out[name] = walk(sub)
            return out
        return node

    return walk(params)


def fuse_qkv_params(params):
    """Convert a split-QKV param tree (query/key/value Dense per attention
    block) to the qkv_impl='fused' layout: one concatenated [hidden,
    3*hidden] kernel + [3*hidden] bias named 'qkv'. Concatenation order is
    (q, k, v), matching the jnp.split in _SelfAttention — numerics are
    bit-identical (each output column's dot product is unchanged)."""
    from collections.abc import Mapping

    def walk(node):
        if isinstance(node, Mapping):
            if {"query", "key", "value"} <= set(node.keys()):
                out = {k: walk(v) for k, v in node.items()
                       if k not in ("query", "key", "value")}
                out["qkv"] = {
                    "kernel": jnp.concatenate(
                        [node[n]["kernel"] for n in ("query", "key", "value")],
                        axis=1),
                    "bias": jnp.concatenate(
                        [node[n]["bias"] for n in ("query", "key", "value")]),
                }
                return out
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(params)


class _Layer(nn.Module):
    arch: EncoderArch
    dtype: Any

    @nn.compact
    def __call__(self, x, mask):
        a = self.arch
        attn = _SelfAttention(a, self.dtype, name="attention")(x, mask)
        x = nn.LayerNorm(epsilon=a.layer_norm_eps, dtype=jnp.float32,
                         name="attention_ln")(x + attn).astype(self.dtype)
        if a.mlp_impl == "int8":
            from ..ops.int8_matmul import fused_int8_mlp

            w1q, s1, b1 = _Int8DenseParams(a.hidden, a.intermediate,
                                           name="intermediate")()
            w2q, s2, b2 = _Int8DenseParams(a.intermediate, a.hidden,
                                           name="output")()
            h = fused_int8_mlp(
                x.reshape(-1, a.hidden).astype(self.dtype),
                w1q, s1, b1, w2q, s2, b2,
                gelu_tanh=a.gelu_impl == "tanh",
                interpret=jax.default_backend() != "tpu",
            ).reshape(x.shape)
        else:
            h = nn.Dense(a.intermediate, dtype=self.dtype,
                         name="intermediate")(x)
            h = nn.gelu(h, approximate=a.gelu_impl == "tanh")
            h = nn.Dense(a.hidden, dtype=self.dtype, name="output")(h)
        x = nn.LayerNorm(epsilon=a.layer_norm_eps, dtype=jnp.float32,
                         name="output_ln")(x + h).astype(self.dtype)
        return x


def encoder_trunk(arch: EncoderArch, dtype, input_ids, attention_mask):
    """Embedding assembly + transformer stack, shared by FlaxEncoder and
    FlaxCrossEncoderClassifier (the ONE source of the RoBERTa position-id
    formula — pad positions skipped, ids start at pos_offset). Must be
    called from inside an @nn.compact ``__call__``: the named submodules
    register on the CALLING module, keeping param paths identical to the
    previous inline definitions (checkpoints/hf_loader unaffected).
    Returns (hidden_states [B, L, H] in ``dtype``, bool mask)."""
    a = arch
    mask = attention_mask.astype(bool)
    emb = nn.Embed(a.vocab_size, a.hidden, dtype=dtype,
                   name="word_embeddings")(input_ids)
    # RoBERTa-style position ids skip pad positions and start at offset.
    if a.pos_offset:
        positions = jnp.cumsum(attention_mask, axis=-1) * attention_mask
        positions = positions + (a.pos_offset - 1) * attention_mask
    else:
        positions = jnp.broadcast_to(
            jnp.arange(input_ids.shape[-1]), input_ids.shape)
    emb = emb + nn.Embed(a.max_positions, a.hidden, dtype=dtype,
                         name="position_embeddings")(positions)
    emb = emb + nn.Embed(a.type_vocab, a.hidden, dtype=dtype,
                         name="token_type_embeddings")(
        jnp.zeros_like(input_ids))
    x = nn.LayerNorm(epsilon=a.layer_norm_eps, dtype=jnp.float32,
                     name="embeddings_ln")(emb).astype(dtype)
    for i in range(a.layers):
        x = _Layer(a, dtype, name=f"layer_{i}")(x, mask)
    return x, mask


class FlaxEncoder(nn.Module):
    """BERT-family encoder returning a pooled, L2-normalized embedding."""

    arch: EncoderArch
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask):
        a = self.arch
        x, mask = encoder_trunk(a, self.dtype, input_ids, attention_mask)

        if a.pooling == "mean":
            denom = jnp.maximum(mask.sum(-1, keepdims=True), 1)
            pooled = (x * mask[..., None]).sum(axis=-2) / denom
        else:  # cls
            pooled = x[..., 0, :]
        pooled = pooled.astype(jnp.float32)
        return pooled / jnp.maximum(
            jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12)


def _bucket_length(n: int, max_length: int) -> int:
    """Round sequence length up to a power-of-two bucket (min 16) to bound
    the number of compiled shapes."""
    b = 16
    while b < min(n, max_length):
        b *= 2
    return min(b, max_length)


class TextEncoder:
    """Host-facing wrapper: texts -> L2-normalized np.float32 embeddings.

    Replaces HuggingFaceEmbeddings.embed_query / add_texts in the reference
    stack; batches all queries of a request (original + HyDE) in one jitted
    forward.
    """

    def __init__(
        self,
        preset: str = "tiny-test",
        arch: Optional[EncoderArch] = None,
        params: Optional[Any] = None,
        tokenizer: Optional[Callable[[List[str], int], Dict[str, np.ndarray]]] = None,
        dtype: Any = jnp.float32,
        max_length: int = 512,
        seed: int = 0,
    ) -> None:
        self.arch = arch or ENCODER_PRESETS[preset]
        self.max_length = min(max_length, self.arch.max_positions - self.arch.pos_offset)
        self.module = FlaxEncoder(self.arch, dtype=dtype)
        if tokenizer is None:
            from .tokenizer import HashTokenizer

            tokenizer = HashTokenizer(self.arch.vocab_size, pad_id=self.arch.pad_id)
        self.tokenizer = tokenizer
        if params is None:
            ids = jnp.zeros((1, 16), jnp.int32)
            params = self.module.init(jax.random.PRNGKey(seed), ids, jnp.ones_like(ids))
        self.params = params
        self._forward = jax.jit(self.module.apply)

    @property
    def dim(self) -> int:
        return self.arch.hidden

    def quantize_mlp(self) -> "TextEncoder":
        """Switch this encoder to the fused int8 MLP path in place:
        pre-quantizes the MLP kernels (``quantize_mlp_params``) and rebuilds
        the jitted forward with mlp_impl='int8'. ~1e-2 relative embedding
        error; returns self for chaining."""
        import dataclasses

        if self.arch.mlp_impl != "int8":
            self.arch = dataclasses.replace(self.arch, mlp_impl="int8")
            self.module = FlaxEncoder(self.arch, dtype=self.module.dtype)
            self.params = quantize_mlp_params(self.params)
            self._forward = jax.jit(self.module.apply)
        return self

    def fuse_qkv(self) -> "TextEncoder":
        """Switch to the fused-QKV attention projection in place (one
        [hidden, 3*hidden] GEMM per layer); bit-identical outputs."""
        import dataclasses

        if self.arch.qkv_impl != "fused":
            self.arch = dataclasses.replace(self.arch, qkv_impl="fused")
            self.module = FlaxEncoder(self.arch, dtype=self.module.dtype)
            self.params = fuse_qkv_params(self.params)
            self._forward = jax.jit(self.module.apply)
        return self

    def tokenize_padded(self, texts: List[str]):
        """(ids, mask) int32 arrays padded to the power-of-two length
        bucket — the ONE tokenization used by every encoder consumer
        (encode here, the fused ensemble search, the fused serve path), so
        their token matrices can never drift apart."""
        batch = self.tokenizer(texts, self.max_length)
        seq = batch["input_ids"].shape[1]
        bucket = _bucket_length(seq, self.max_length)
        pad = bucket - seq
        ids = np.pad(batch["input_ids"], ((0, 0), (0, pad)),
                     constant_values=self.arch.pad_id)
        mask = np.pad(batch["attention_mask"], ((0, 0), (0, pad)))
        return ids.astype(np.int32), mask.astype(np.int32)

    def encode(self, texts: List[str]) -> np.ndarray:
        if not texts:
            return np.zeros((0, self.arch.hidden), np.float32)
        ids, mask = self.tokenize_padded(texts)
        out = self._forward(self.params, jnp.asarray(ids), jnp.asarray(mask))
        return np.asarray(out, dtype=np.float32)

    # reference-compatible aliases (HuggingFaceEmbeddings API)
    def embed_query(self, text: str) -> List[float]:
        return self.encode([text])[0].tolist()

    def embed_documents(self, texts: List[str]) -> List[List[float]]:
        return self.encode(texts).tolist()
