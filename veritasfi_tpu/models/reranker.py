"""LLM cross-encoder reranker (bge-reranker-v2-gemma class) in Flax.

TPU-native replacement for FlagEmbedding's FlagLLMReranker
(reference: src/utils/vllmChatService.py:90, used under a global lock at
vllmManager.py:450-452). The scoring mechanism is visible in the reference's
stress harness (experiments/profile/stress_test.py:97-146,219-226):

    input  = [bos] "A: {query}" "\\n" "B: {passage}" "\\n" {instruction}
    score  = logits[last_token, yes_token_id]

Here the decoder is a Gemma-family causal LM (RMSNorm, RoPE, GQA/MQA,
GeGLU, tied LM head) scored in batched jitted forwards with fp32 logits at
each sequence's true last position (so right-padding is fine), replacing the
lock with a continuous-batching queue (rerank/batcher.py).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclass(frozen=True)
class DecoderArch:
    vocab_size: int = 256_000
    hidden: int = 2048
    layers: int = 18
    heads: int = 8
    kv_heads: int = 1
    head_dim: int = 256
    intermediate: int = 16_384
    rope_theta: float = 10_000.0
    rms_eps: float = 1e-6
    pad_id: int = 0
    bos_id: int = 2
    # Gemma vocab order: <pad>=0, <eos>=1, <bos>=2, <unk>=3 — the default
    # stop token for generation when a caller/tokenizer supplies none
    eos_id: int = 1
    # Gemma scales embeddings by sqrt(hidden) and uses (1+w) RMSNorm.
    embed_scale: bool = True
    rms_plus_one: bool = True
    # Gemma divides q by sqrt(head_dim); some variants use hidden/heads.
    query_scale: Optional[float] = None
    # LoRA on q/k/v/o projections (reference training recipe: r=32 alpha=64
    # on q,k,v,o_proj — train_bge_rr.sh:10-17). 0 disables.
    lora_rank: int = 0
    lora_alpha: float = 64.0
    # -- Qwen-family knobs (the reference serves Qwen2.5-72B-AWQ via vLLM,
    # config/example.yaml:5, and judges hit-rate with Qwen3-Embedding-4B,
    # step3_mul.py:384) -------------------------------------------------
    # Qwen2/2.5 attention has biases on q/k/v (not o).
    attn_bias: bool = False
    # "gelu" (Gemma GeGLU) or "silu" (Qwen SwiGLU).
    mlp_act: str = "gelu"
    # Gemma/Qwen2.5-0.5B tie the LM head to the embedding; larger Qwen
    # variants carry a separate lm_head.weight.
    tied_head: bool = True
    # Qwen3 applies per-head RMSNorm to q and k before RoPE.
    qk_norm: bool = False
    # Qwen tokenizers add no BOS; Gemma prepends <bos>=2.
    add_bos: bool = True


DECODER_PRESETS: Dict[str, DecoderArch] = {
    "tiny-test": DecoderArch(vocab_size=512, hidden=64, layers=2, heads=4,
                             kv_heads=2, head_dim=16, intermediate=128),
    # bge-reranker-v2-gemma backbone (google/gemma-2b)
    "gemma-2b": DecoderArch(),
    # scaled-down gemma shape (~150M params) for generation benches on
    # hardware without checkpoints
    "gemma-mini": DecoderArch(vocab_size=32_768, hidden=1024, layers=8,
                              heads=8, kv_heads=1, head_dim=128,
                              intermediate=4096),
    # -- Qwen2.5 family (the reference's chat model line:
    # Qwen2.5-72B-Instruct-AWQ, config/example.yaml:5). Qwen: SwiGLU,
    # plain RMSNorm, q/k/v biases, no embed scale, no BOS, theta 1e6.
    "qwen2.5-0.5b": DecoderArch(
        vocab_size=151_936, hidden=896, layers=24, heads=14, kv_heads=2,
        head_dim=64, intermediate=4864, rope_theta=1e6, pad_id=151_643,
        bos_id=151_643, eos_id=151_645, embed_scale=False,
        rms_plus_one=False, attn_bias=True, mlp_act="silu", tied_head=True,
        add_bos=False),
    "qwen2.5-1.5b": DecoderArch(
        vocab_size=151_936, hidden=1536, layers=28, heads=12, kv_heads=2,
        head_dim=128, intermediate=8960, rope_theta=1e6, pad_id=151_643,
        bos_id=151_643, eos_id=151_645, embed_scale=False,
        rms_plus_one=False, attn_bias=True, mlp_act="silu", tied_head=True,
        add_bos=False),
    "qwen2.5-7b": DecoderArch(
        vocab_size=152_064, hidden=3584, layers=28, heads=28, kv_heads=4,
        head_dim=128, intermediate=18_944, rope_theta=1e6, pad_id=151_643,
        bos_id=151_643, eos_id=151_645, embed_scale=False,
        rms_plus_one=False, attn_bias=True, mlp_act="silu", tied_head=False,
        add_bos=False),
    # Qwen3-Embedding backbone (the reference's hit-rate judge model class,
    # step3_mul.py:384; last-token pooling lives in models/decoder_embedder)
    "qwen3-embedding-0.6b": DecoderArch(
        vocab_size=151_669, hidden=1024, layers=28, heads=16, kv_heads=8,
        head_dim=128, intermediate=3072, rope_theta=1e6, pad_id=151_643,
        bos_id=151_643, eos_id=151_643, embed_scale=False,
        rms_plus_one=False, attn_bias=False, mlp_act="silu", tied_head=True,
        qk_norm=True, add_bos=False),
    # bge-reranker-v2-minicpm-layerwise-class sizes could be added similarly.
}


class RMSNorm(nn.Module):
    eps: float
    plus_one: bool

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        x = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
        x = x * jax.lax.rsqrt(var + self.eps)
        # identity at init under either convention: Gemma stores w with
        # effective scale (1+w) (zeros), Qwen plain w (ones)
        init = (nn.initializers.zeros if self.plus_one
                else nn.initializers.ones)
        w = self.param("weight", init, (x.shape[-1],))
        scale = (1.0 + w) if self.plus_one else w
        return (x * scale).astype(dtype)


def rope(x: jax.Array, positions: jax.Array, theta: float) -> jax.Array:
    """Rotary position embedding over the last dim ([B, T, H, D])."""
    d = x.shape[-1]
    half = d // 2
    freq = theta ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    angles = positions[..., None].astype(jnp.float32) * freq  # [B, T, half]
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = x[..., :half], x[..., half:]
    out = jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    )
    return out.astype(x.dtype)


class LoRADense(nn.Module):
    """Dense with an optional low-rank adapter: y = xW + (x A) B * alpha/r.

    A ~ N(0, 0.02), B = 0 at init, so training starts from the base model.
    """

    features: int
    rank: int
    alpha: float
    dtype: Any
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.features, use_bias=self.use_bias, dtype=self.dtype,
                     name="base")(x)
        if self.rank > 0:
            a = self.param("lora_a", nn.initializers.normal(0.02),
                           (x.shape[-1], self.rank))
            b = self.param("lora_b", nn.initializers.zeros,
                           (self.rank, self.features))
            scale = self.alpha / self.rank
            y = y + (x @ a.astype(self.dtype)) @ b.astype(self.dtype) * scale
        return y


class _Attention(nn.Module):
    arch: DecoderArch
    dtype: Any

    @nn.compact
    def __call__(self, x, mask, positions, cache=None, cache_offset=0):
        """``cache``: optional (k [B, L, kvh, hd], v [B, L, kvh, hd],
        key_mask [B, L]) for KV-cached decoding — new tokens' k/v are
        written at ``cache_offset`` and attention runs over the whole cache
        window. Returns (out, new_cache)."""
        a = self.arch
        b, t, _ = x.shape

        def proj(features, name, bias=False):
            if a.lora_rank > 0:
                return LoRADense(features, a.lora_rank, a.lora_alpha,
                                 self.dtype, use_bias=bias, name=name)
            return nn.Dense(features, use_bias=bias, dtype=self.dtype,
                            name=name)

        # Qwen2/2.5 carries biases on q/k/v only (never o_proj)
        q = proj(a.heads * a.head_dim, "q_proj", a.attn_bias)(x).reshape(
            b, t, a.heads, a.head_dim)
        k = proj(a.kv_heads * a.head_dim, "k_proj", a.attn_bias)(x).reshape(
            b, t, a.kv_heads, a.head_dim)
        v = proj(a.kv_heads * a.head_dim, "v_proj", a.attn_bias)(x).reshape(
            b, t, a.kv_heads, a.head_dim)

        if a.qk_norm:
            # Qwen3: per-head RMSNorm over head_dim before RoPE
            q = RMSNorm(a.rms_eps, a.rms_plus_one, name="q_norm")(q)
            k = RMSNorm(a.rms_eps, a.rms_plus_one, name="k_norm")(k)

        q = rope(q, positions, a.rope_theta)
        k = rope(k, positions, a.rope_theta)

        scale = a.query_scale or (a.head_dim ** -0.5)
        rep = a.heads // a.kv_heads

        if cache is not None:
            ck, cv, key_mask = cache
            per_row = jnp.ndim(cache_offset) == 1
            if per_row:
                # continuous-batching decode: each row writes its own cache
                # slots starting at its offset (t new tokens, ring-indexed
                # mod the window). Visibility: previously-valid keys via
                # key_mask, the t in-block keys via write-index causality
                # (query j sees writes k <= j — ring wraps can overwrite
                # old slots, so physical position no longer orders time).
                # Key masks for the new slots are NOT persisted here; the
                # caller commits them after the step (decode steps set the
                # written slot's bit in their own program).
                w = ck.shape[1]
                rows = jnp.arange(b)[:, None]
                js = jnp.arange(t)[None, :]
                slots = (cache_offset[:, None] + js) % w       # [B, t]
                ck = ck.at[rows, slots].set(k.astype(ck.dtype))
                cv = cv.at[rows, slots].set(v.astype(cv.dtype))
                written_at = jnp.full((b, w), -1, jnp.int32).at[
                    rows, slots].set(js)                       # [B, L]
                vis = ((key_mask | (written_at >= 0))[:, None, :]
                       & (written_at[:, None, :] <= js[0][None, :, None]))
                full = vis[:, None, :, :]                      # [B,1,t,L]
            else:
                ck = jax.lax.dynamic_update_slice(
                    ck, k.astype(ck.dtype), (0, cache_offset, 0, 0))
                cv = jax.lax.dynamic_update_slice(
                    cv, v.astype(cv.dtype), (0, cache_offset, 0, 0))
                key_pos = jnp.arange(ck.shape[1])
                q_pos = cache_offset + jnp.arange(t)
                causal = key_pos[None, :] <= q_pos[:, None]    # [t, L]
                full = causal[None, None] & key_mask[:, None, None, :]
            new_cache = (ck, cv, key_mask)
            kk = jnp.repeat(ck, rep, axis=2)
            vv = jnp.repeat(cv, rep, axis=2)
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, kk.astype(q.dtype),
                                preferred_element_type=jnp.float32) * scale
            scores = jnp.where(full, scores, jnp.finfo(jnp.float32).min)
            probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs,
                             vv.astype(self.dtype)).reshape(b, t, -1)
            return proj(a.hidden, "o_proj")(ctx), new_cache

        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        causal = jnp.tril(jnp.ones((t, t), bool))
        full_mask = causal[None, None] & mask[:, None, None, :]
        scores = jnp.where(full_mask, scores, jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, -1)
        return proj(a.hidden, "o_proj")(ctx), None


class _Block(nn.Module):
    arch: DecoderArch
    dtype: Any

    @nn.compact
    def __call__(self, x, mask, positions, cache=None, cache_offset=0):
        a = self.arch
        h = RMSNorm(a.rms_eps, a.rms_plus_one, name="input_ln")(x)
        attn, new_cache = _Attention(a, self.dtype, name="attn")(
            h, mask, positions, cache=cache, cache_offset=cache_offset)
        x = x + attn
        h = RMSNorm(a.rms_eps, a.rms_plus_one, name="post_ln")(x)
        gate = nn.Dense(a.intermediate, use_bias=False, dtype=self.dtype,
                        name="gate_proj")(h)
        up = nn.Dense(a.intermediate, use_bias=False, dtype=self.dtype,
                      name="up_proj")(h)
        act = nn.silu if a.mlp_act == "silu" else (
            lambda g: nn.gelu(g, approximate=True))
        h = act(gate) * up
        h = nn.Dense(a.hidden, use_bias=False, dtype=self.dtype,
                     name="down_proj")(h)
        return x + h, new_cache


class FlaxDecoderLM(nn.Module):
    """Causal LM returning fp32 logits for selected vocabulary columns.

    With ``cache`` (per-layer KV tuples) the forward runs in cached-decode
    mode: new tokens write into the cache at ``cache_offset`` and attend
    over the full cache window; returns (logits, new_caches)."""

    arch: DecoderArch
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask, logit_ids=None,
                 cache=None, cache_offset=0, positions=None,
                 output_hidden=False):
        a = self.arch
        mask = attention_mask.astype(bool)
        embed = nn.Embed(a.vocab_size, a.hidden, dtype=self.dtype,
                         name="embed_tokens")
        x = embed(input_ids)
        if a.embed_scale:
            x = x * jnp.asarray(math.sqrt(a.hidden), self.dtype)
        if positions is None:
            positions = jnp.cumsum(attention_mask, axis=-1) - 1
            positions = jnp.maximum(positions, 0)
        new_caches = [] if cache is not None else None
        for i in range(a.layers):
            layer_cache = cache[i] if cache is not None else None
            x, new_cache = _Block(a, self.dtype, name=f"layer_{i}")(
                x, mask, positions, cache=layer_cache,
                cache_offset=cache_offset)
            if cache is not None:
                new_caches.append(new_cache)
        x = RMSNorm(a.rms_eps, a.rms_plus_one, name="final_ln")(x)
        x = x.astype(jnp.float32)
        if output_hidden:
            # final-norm hidden states (for last-token-pooling embedders,
            # models/decoder_embedder.py) — skips the vocab projection
            return (x, new_caches) if cache is not None else x
        if a.tied_head:
            table = embed.embedding.astype(jnp.float32)
        else:
            # HF lm_head.weight layout: [vocab, hidden]
            table = self.param(
                "lm_head", nn.initializers.normal(0.02),
                (a.vocab_size, a.hidden)).astype(jnp.float32)
        if logit_ids is not None:
            table = table[jnp.asarray(logit_ids)]
        logits = jnp.einsum("btd,vd->btv", x, table)
        if cache is not None:
            return logits, new_caches
        return logits


def yes_logit_score(module, params, input_ids, attention_mask, yes_id):
    """score[i] = logits[i, last_real_token_i, yes_id] (fp32).

    Computing at the true last position makes right-padding safe (the
    reference relies on tokenizer left-padding + logits[:, -1],
    stress_test.py:226)."""
    logits = module.apply(params, input_ids, attention_mask,
                          logit_ids=jnp.asarray([yes_id]))
    last = jnp.maximum(attention_mask.sum(axis=-1) - 1, 0)
    return logits[jnp.arange(logits.shape[0]), last, 0]


_RERANK_PROMPT = ("Given a query A and a passage B, determine whether the "
                  "passage contains an answer to the query by providing a "
                  "prediction of either 'Yes' or 'No'.")


class CrossEncoderReranker:
    """Batched (query, passage) scorer with the FlagLLMReranker API.

    ``compute_score(pairs, batch_size=8)`` matches the reference call site
    (vllmManager.py:450-452). Sequences are length-bucketed to bound
    recompilation; logits are computed only for the yes-token column.
    """

    def __init__(
        self,
        preset: str = "tiny-test",
        arch: Optional[DecoderArch] = None,
        params: Optional[Any] = None,
        tokenizer=None,
        dtype: Any = jnp.float32,
        query_max_length: int = 512,
        passage_max_length: int = 1024,
        seed: int = 0,
    ) -> None:
        self.arch = arch or DECODER_PRESETS[preset]
        self.module = FlaxDecoderLM(self.arch, dtype=dtype)
        self.query_max_length = query_max_length
        self.passage_max_length = passage_max_length
        if tokenizer is None:
            from .tokenizer import HashTokenizer

            tokenizer = HashTokenizer(self.arch.vocab_size,
                                      pad_id=self.arch.pad_id)
        self.tokenizer = tokenizer
        self.yes_id = self._token_id("Yes")
        self._prompt_ids = self._encode_raw(_RERANK_PROMPT)
        self._sep_ids = self._encode_raw("\n")
        if params is None:
            ids = jnp.zeros((1, 16), jnp.int32)
            params = self.module.init(jax.random.PRNGKey(seed), ids,
                                      jnp.ones_like(ids))
        self.params = params
        self._score = jax.jit(
            lambda p, ids, mask: yes_logit_score(
                self.module, p, ids, mask, self.yes_id))

        def _score_sim(p, ids, mask, emb):
            from ..ops.similarity import cosine_similarity_matrix

            s = yes_logit_score(self.module, p, ids, mask, self.yes_id)
            return s, cosine_similarity_matrix(emb)

        self._score_sim = jax.jit(_score_sim)

    # -- tokenization helpers -------------------------------------------
    def _token_id(self, text: str) -> int:
        hf = getattr(self.tokenizer, "hf", None)
        if hf is not None:
            return hf(text, add_special_tokens=False)["input_ids"][0]
        return self.tokenizer.token_id(text)

    def _encode_raw(self, text: str) -> List[int]:
        hf = getattr(self.tokenizer, "hf", None)
        if hf is not None:
            return hf(text, add_special_tokens=False)["input_ids"]
        from .tokenizer import basic_tokens

        return [self.tokenizer.token_id(t) for t in basic_tokens(text)]

    def pair_layout(self, query: str):
        """Canonical pair-row layout: (prefix, passage budget, suffix) with
        row = prefix + passage_tokens[:max(budget, 0)] + suffix, passages
        tokenized as 'B: {p}'. The ONE source of the
        [bos] 'A: {q}' \\n 'B: {p}' \\n {instruction} framing
        (format: reference stress_test.py:97-131) — encode_pair and the
        fused serve path both call it, so they cannot drift.

        The query is truncated at ``query_max_length`` (train_bge_rr.sh:19)
        with a 3/4-row ceiling so a huge configured query cap can never
        starve the passage; the budget subtracts the SUFFIX too, so a
        finished row never exceeds ``passage_max_length`` (the row cap that
        sizes every serve-path compile bucket)."""
        q_cap = min(self.query_max_length, self.passage_max_length * 3 // 4)
        q_ids = self._encode_raw(f"A: {query}")[:q_cap]
        suffix = list(self._sep_ids) + list(self._prompt_ids)
        bos = [self.arch.bos_id] if self.arch.add_bos else []
        budget = (self.passage_max_length - len(q_ids) - len(bos)
                  - len(self._sep_ids) - len(suffix))
        prefix = bos + list(q_ids) + list(self._sep_ids)
        return prefix, budget, suffix

    def encode_pair(self, query: str, passage: str) -> List[int]:
        """[bos] 'A: {q}' \\n 'B: {p}' \\n {instruction}
        (format: stress_test.py:97-131; lengths: train_bge_rr.sh:20-21)."""
        prefix, budget, suffix = self.pair_layout(query)
        p_ids = self._encode_raw(f"B: {passage}")[: max(budget, 0)]
        return prefix + p_ids + suffix

    # -- scoring ---------------------------------------------------------
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
        out = self._score(self.params, jnp.asarray(ids), jnp.asarray(mask))
        return np.asarray(out, np.float32)

    def score_and_sim(self, rows: List[List[int]], embeddings) -> tuple:
        """One device call returning (yes-logit scores, pairwise cosine of
        the candidates' retrieval embeddings) — both rerank-fusion inputs
        without a second dispatch."""
        if not rows:
            return (np.zeros((0,), np.float32),
                    np.zeros((0, 0), np.float32))
        seq = max(len(r) for r in rows)
        bucket = max(-(-seq // 64) * 64, 64)
        ids = np.full((len(rows), bucket), self.arch.pad_id, np.int32)
        mask = np.zeros((len(rows), bucket), np.int32)
        for i, r in enumerate(rows):
            ids[i, : len(r)] = r
            mask[i, : len(r)] = 1
        s, sim = self._score_sim(self.params, jnp.asarray(ids),
                                 jnp.asarray(mask), jnp.asarray(embeddings))
        s, sim = jax.device_get((s, sim))
        return np.asarray(s, np.float32), np.asarray(sim, np.float32)

    def compute_score(self, pairs: List[List[str]], batch_size: int = 8) -> List[float]:
        rows = [self.encode_pair(q, p) for q, p in pairs]
        scores: List[float] = []
        for i in range(0, len(rows), batch_size):
            scores.extend(self.score_tokens(rows[i: i + batch_size]).tolist())
        return scores
