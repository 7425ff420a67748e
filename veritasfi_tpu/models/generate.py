"""KV-cached autoregressive generation on the Flax decoder.

The reference serves its chat LLM from an external vLLM process
(reference: config/example.yaml:5-7) and SURVEY.md §7.4 marks a JAX
inference backend as the optional extension — this is that backend: a
jit-compiled prefill + lax.scan decode loop with explicit per-layer KV
caches, greedy / temperature + top-p sampling, EOS stopping, and an
OpenAI-protocol-compatible local adapter (``LocalChatBackend``) that is a
drop-in for serving.llm_client.LLMClient.

Design: prompts are LEFT-padded so every row's last prompt token sits at
the same cache offset; the whole generation (prefill + N decode steps) is
ONE compiled program — no per-token host round-trips (which matter doubly
through this environment's dispatch relay).
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .reranker import DecoderArch, FlaxDecoderLM


def init_cache(arch: DecoderArch, batch: int, max_len: int,
               dtype=jnp.float32) -> List[Tuple]:
    """Per-layer (k, v, key_mask) caches."""
    return [
        (jnp.zeros((batch, max_len, arch.kv_heads, arch.head_dim), dtype),
         jnp.zeros((batch, max_len, arch.kv_heads, arch.head_dim), dtype),
         jnp.zeros((batch, max_len), bool))
        for _ in range(arch.layers)
    ]


def left_pad(rows: List[List[int]], pad_id: int) -> Tuple[np.ndarray, np.ndarray]:
    """Left-pad prompt token rows to a common length."""
    width = max(len(r) for r in rows)
    ids = np.full((len(rows), width), pad_id, np.int32)
    mask = np.zeros((len(rows), width), np.int32)
    for i, r in enumerate(rows):
        if r:
            ids[i, -len(r):] = r
            mask[i, -len(r):] = 1
    return ids, mask


def _sample(logits: jax.Array, key, temperature: float,
            top_p: float) -> jax.Array:
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / temperature
    # top-p (nucleus): mask tokens outside the smallest set with cumulative
    # probability >= top_p
    sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    cutoff_idx = jnp.sum(cum < top_p, axis=-1)                  # [B]
    cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx[:, None],
                                 axis=-1)                       # [B, 1]
    masked = jnp.where(logits >= cutoff, logits, -jnp.inf)
    return jax.random.categorical(key, masked, axis=-1).astype(jnp.int32)


def _sample_rows(logits: jax.Array, key, temperature: jax.Array,
                 top_p: jax.Array) -> jax.Array:
    """Per-ROW temperature/top-p sampling ([B, V] logits, [B] params);
    rows with temperature <= 0 decode greedily. The vector form of
    ``_sample`` for continuous batching, where every slot carries its own
    request's sampling params (vLLM SamplingParams equivalent)."""
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    t = jnp.maximum(temperature, 1e-6)[:, None]
    scaled = logits / t
    sorted_logits = jnp.sort(scaled, axis=-1)[:, ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    cutoff_idx = jnp.sum(cum < top_p[:, None], axis=-1)
    cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx[:, None], axis=-1)
    masked = jnp.where(scaled >= cutoff, scaled, -jnp.inf)
    sampled = jax.random.categorical(key, masked, axis=-1).astype(jnp.int32)
    return jnp.where(temperature <= 0.0, greedy, sampled)


class Generator:
    """Compiled prefill + scan decode on a FlaxDecoderLM."""

    def __init__(self, module: FlaxDecoderLM, params: Any,
                 max_prompt_len: int = 512, max_new_tokens: int = 256,
                 cache_dtype=jnp.float32, mesh=None,
                 model_axis: str = "model") -> None:
        """``mesh``: optional jax.sharding.Mesh with a ``model_axis`` —
        tensor-parallel generation. Params are laid out with the same rules
        as training (train.reranker_lora.param_sharding_rules: column-
        parallel q/k/v/gate/up, row-parallel o/down, vocab-sharded
        embedding); the KV cache sharding (kv_heads over the model axis)
        is propagated by GSPMD from the projections, and XLA inserts the
        all-reduces after o_proj/down_proj. Outputs are bit-comparable to
        single-device generation up to psum reassociation ulps."""
        self.module = module
        if mesh is not None:
            from ..train.reranker_lora import shard_params

            params = shard_params(params, mesh, model_axis)
        self.mesh = mesh
        self.params = params
        self.arch = module.arch
        self.max_prompt_len = max_prompt_len
        self.max_new_tokens = max_new_tokens
        self.cache_dtype = cache_dtype
        # only max_new is static (it sets shapes); temperature/top_p/eos are
        # TRACED so a client sweeping sampling params never recompiles the
        # whole prefill+decode program
        self._generate = jax.jit(
            self._generate_impl, static_argnames=("max_new",))
        self._auto_seed = 0

    def _next_seed(self, seed: Optional[int]) -> int:
        """Explicit seeds reproduce; None varies per call (OpenAI-style
        nondeterministic sampling unless the client pins a seed)."""
        if seed is not None:
            return seed
        self._auto_seed += 1
        return self._auto_seed

    def _prep_prompt(self, rows: List[List[int]]):
        """Truncate (keep tail) + left-pad + power-of-two bucket — the one
        prompt prep shared by the batch and streaming paths."""
        rows = [r[-self.max_prompt_len:] for r in rows]
        ids, mask = left_pad(rows, self.arch.pad_id)
        bucket = 1 << max(4, (ids.shape[1] - 1).bit_length())
        pad = bucket - ids.shape[1]
        if pad:
            ids = np.pad(ids, ((0, 0), (pad, 0)),
                         constant_values=self.arch.pad_id)
            mask = np.pad(mask, ((0, 0), (pad, 0)))
        return ids, mask

    # ------------------------------------------------------------------
    def _generate_impl(self, params, ids, mask, rng, temperature, top_p,
                       eos_id, max_new: int):
        b, prompt_len = ids.shape
        total = prompt_len + max_new
        cache = init_cache(self.arch, b, total, self.cache_dtype)
        # mark prompt keys (pads stay masked out)
        cache = [(k, v, km.at[:, :prompt_len].set(mask.astype(bool)))
                 for k, v, km in cache]

        positions = jnp.maximum(jnp.cumsum(mask, axis=-1) - 1, 0)
        logits, cache = self.module.apply(
            params, ids, mask, cache=cache, cache_offset=0,
            positions=positions)
        last_logits = logits[:, -1, :]
        next_pos = positions[:, -1] + 1                  # [B]
        temp_v = jnp.broadcast_to(temperature, (b,))
        topp_v = jnp.broadcast_to(top_p, (b,))

        def step(carry, i):
            cache, last_logits, pos, rng, done = carry
            rng, key = jax.random.split(rng)
            tok = _sample_rows(last_logits, key, temp_v, topp_v)
            tok = jnp.where(done, eos_id, tok)
            offset = prompt_len + i
            cache = [(k, v, km.at[:, offset].set(~done))
                     for k, v, km in cache]
            logits, cache = self.module.apply(
                params, tok[:, None],
                jnp.ones((b, 1), jnp.int32),
                cache=cache, cache_offset=offset,
                positions=pos[:, None])
            done = done | (tok == eos_id)
            return (cache, logits[:, -1, :], pos + 1, rng, done), tok

        init = (cache, last_logits, next_pos, rng,
                jnp.zeros((b,), bool))
        _, tokens = jax.lax.scan(step, init, jnp.arange(max_new))
        return tokens.T                                   # [B, max_new]

    # ------------------------------------------------------------------
    def generate_stream(self, prompt_row: List[int],
                        max_new_tokens: Optional[int] = None,
                        temperature: float = 0.0, top_p: float = 0.8,
                        eos_id: Optional[int] = None,
                        seed: Optional[int] = None):
        """Token-by-token generator (true streaming): compiled prefill +
        one compiled step per token, yielding each token id as it is
        sampled. Costs one device round-trip per token (the scan-based
        ``generate_tokens`` is ONE program and preferred when the client
        does not need incremental output)."""
        if not hasattr(self, "_prefill_jit"):
            def prefill(params, ids, mask, cache):
                positions = jnp.maximum(jnp.cumsum(mask, axis=-1) - 1, 0)
                logits, cache = self.module.apply(
                    params, ids, mask, cache=cache, cache_offset=0,
                    positions=positions)
                return logits[:, -1, :], cache, positions[:, -1] + 1

            def step(params, cache, tok, offset, pos):
                # mask update folded in: a host-side .at[].set here would be
                # one extra dispatch per layer per token through the relay
                cache = [(k, v, km.at[:, offset].set(True))
                         for k, v, km in cache]
                logits, cache = self.module.apply(
                    params, tok[:, None], jnp.ones((1, 1), jnp.int32),
                    cache=cache, cache_offset=offset,
                    positions=pos[:, None])
                return logits[:, -1, :], cache

            self._prefill_jit = jax.jit(prefill)
            self._step_jit = jax.jit(step, donate_argnums=(1,))
            self._sample_jit = jax.jit(
                _sample, static_argnames=("temperature", "top_p"))

        eos = eos_id if eos_id is not None else self.arch.eos_id
        max_new = (self.max_new_tokens if max_new_tokens is None
                   else max_new_tokens)
        ids, mask = self._prep_prompt([prompt_row])
        prompt_len = ids.shape[1]
        cache = init_cache(self.arch, 1, prompt_len + max_new,
                           self.cache_dtype)
        cache = [(k, v, km.at[:, :prompt_len].set(
            jnp.asarray(mask).astype(bool))) for k, v, km in cache]
        logits, cache, pos = self._prefill_jit(
            self.params, jnp.asarray(ids), jnp.asarray(mask), cache)
        rng = jax.random.PRNGKey(self._next_seed(seed))
        for i in range(max_new):
            rng, key = jax.random.split(rng)
            tok = self._sample_jit(logits, key, temperature=float(temperature),
                                   top_p=float(top_p))
            tok_val = int(tok[0])
            if tok_val == eos:
                return
            yield tok_val
            offset = jnp.int32(prompt_len + i)
            logits, cache = self._step_jit(self.params, cache, tok, offset,
                                           pos)
            pos = pos + 1

    # ------------------------------------------------------------------
    def generate_tokens(self, prompt_rows: List[List[int]],
                        max_new_tokens: Optional[int] = None,
                        temperature: float = 0.0, top_p: float = 0.8,
                        eos_id: Optional[int] = None,
                        seed: Optional[int] = None) -> List[List[int]]:
        ids, mask = self._prep_prompt(prompt_rows)
        max_new = (self.max_new_tokens if max_new_tokens is None
                   else max_new_tokens)
        eos = eos_id if eos_id is not None else self.arch.eos_id
        out = self._generate(self.params, jnp.asarray(ids),
                             jnp.asarray(mask),
                             jax.random.PRNGKey(self._next_seed(seed)),
                             jnp.float32(temperature), jnp.float32(top_p),
                             jnp.int32(eos), max_new=max_new)
        out = np.asarray(out)
        results = []
        for row in out:
            toks = []
            for t in row.tolist():
                if t == eos:
                    break
                toks.append(t)
            results.append(toks)
        return results
