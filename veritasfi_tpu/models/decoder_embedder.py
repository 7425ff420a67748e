"""Decoder-based text embedder with last-token pooling (Qwen3-Embedding
class).

The reference's retrieval hit-rate judge embeds evidences/chunks with
Qwen3-Embedding-4B using last-token pooling over the final hidden state
(reference: experiments/retriever/step3_mul.py:181-209 — pools
``hidden[i, last_real_token_i]`` then L2-normalizes; max_length 4096 at
step3_mul.py:199-201; model name at step3_mul.py:384). This module is the
TPU-native equivalent: FlaxDecoderLM (Qwen3 family: SwiGLU, plain RMSNorm,
GQA, per-head q/k norms) run in jitted batched forwards with
``output_hidden=True``, pooled at each sequence's true last position so
right-padding is safe, and normalized in fp32.

Queries may carry the Qwen3-Embedding instruction framing
("Instruct: {task}\nQuery: {q}"); documents embed raw. The surface matches
TextEncoder (encode / embed_query / embed_documents / dim) so the judge,
QA store, and engine accept either family.
"""

from __future__ import annotations

from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .reranker import DECODER_PRESETS, DecoderArch, FlaxDecoderLM

_DEFAULT_INSTRUCTION = ("Given a web search query, retrieve relevant "
                        "passages that answer the query")


def last_token_pool(hidden: jax.Array, attention_mask: jax.Array
                    ) -> jax.Array:
    """h[i] = hidden[i, last_real_token_i], L2-normalized (fp32)."""
    last = jnp.maximum(attention_mask.sum(axis=-1) - 1, 0)
    pooled = hidden[jnp.arange(hidden.shape[0]), last].astype(jnp.float32)
    norm = jnp.linalg.norm(pooled, axis=-1, keepdims=True)
    return pooled / jnp.maximum(norm, 1e-12)


class DecoderEmbedder:
    """Batched decoder embedder: encode(texts) -> [N, hidden] unit vectors."""

    def __init__(
        self,
        preset: str = "tiny-test",
        arch: Optional[DecoderArch] = None,
        params: Optional[Any] = None,
        tokenizer=None,
        dtype: Any = jnp.float32,
        max_length: int = 4096,
        batch_size: int = 16,
        instruction: Optional[str] = _DEFAULT_INSTRUCTION,
        seed: int = 0,
    ) -> None:
        self.arch = arch or DECODER_PRESETS[preset]
        self.module = FlaxDecoderLM(self.arch, dtype=dtype)
        self.max_length = max_length
        self.batch_size = batch_size
        self.instruction = instruction
        # lazy default: token-level callers (encode_tokens) never need a
        # tokenizer, and tiny parity archs are below HashTokenizer's
        # minimum vocab
        self.tokenizer = tokenizer
        if params is None:
            ids = jnp.zeros((1, 16), jnp.int32)
            params = self.module.init(jax.random.PRNGKey(seed), ids,
                                      jnp.ones_like(ids))
        self.params = params
        self._forward = jax.jit(
            lambda p, ids, mask: last_token_pool(
                self.module.apply(p, ids, mask, output_hidden=True), mask))

    @property
    def dim(self) -> int:
        return self.arch.hidden

    # -- tokenization -----------------------------------------------------
    def _encode_raw(self, text: str) -> List[int]:
        if self.tokenizer is None:
            from .tokenizer import HashTokenizer

            self.tokenizer = HashTokenizer(self.arch.vocab_size,
                                           pad_id=self.arch.pad_id)
        hf = getattr(self.tokenizer, "hf", None)
        if hf is not None:
            return hf(text, add_special_tokens=False)["input_ids"]
        from .tokenizer import basic_tokens

        return [self.tokenizer.token_id(t) for t in basic_tokens(text)]

    def _rows(self, texts: List[str]) -> List[List[int]]:
        bos = [self.arch.bos_id] if self.arch.add_bos else []
        # Qwen3-Embedding appends <|endoftext|> (the eos) so the pooled
        # last token is a stable summary position across inputs; truncate
        # the TEXT, not the suffix — a dropped eos would pool an arbitrary
        # mid-sentence token for every overlong document
        # clamp: max_length <= len(bos)+1 would make this negative and the
        # [:body] slice keep nearly ALL tokens, overflowing the bucket so
        # encode_tokens' clamp drops the eos this code exists to preserve
        body = max(0, self.max_length - 1 - len(bos))
        return [bos + self._encode_raw(t)[:body] + [self.arch.eos_id]
                for t in texts]

    # -- embedding --------------------------------------------------------
    def encode_tokens(self, rows: List[List[int]]) -> np.ndarray:
        if not rows:
            return np.zeros((0, self.arch.hidden), np.float32)
        out: List[np.ndarray] = []
        for i in range(0, len(rows), self.batch_size):
            batch = rows[i: i + self.batch_size]
            seq = max(len(r) for r in batch)
            bucket = min(max(-(-seq // 64) * 64, 64), self.max_length)
            ids = np.full((len(batch), bucket), self.arch.pad_id, np.int32)
            mask = np.zeros((len(batch), bucket), np.int32)
            for j, r in enumerate(batch):
                r = r[:bucket]
                ids[j, : len(r)] = r
                mask[j, : len(r)] = 1
            out.append(np.asarray(
                self._forward(self.params, jnp.asarray(ids),
                              jnp.asarray(mask)), np.float32))
        return np.concatenate(out, axis=0)

    def encode(self, texts: List[str]) -> np.ndarray:
        return self.encode_tokens(self._rows(list(texts)))

    def embed_query(self, text: str) -> List[float]:
        if self.instruction:
            text = f"Instruct: {self.instruction}\nQuery: {text}"
        return self.encode([text])[0].tolist()

    def embed_documents(self, texts: List[str]) -> List[List[float]]:
        return self.encode(list(texts)).tolist()


def load_decoder_embedder_from_dir(path: str, max_length: int = 4096,
                                   dtype=None, instruction=_DEFAULT_INSTRUCTION,
                                   batch_size: int = 16) -> DecoderEmbedder:
    """Build a DecoderEmbedder from a local HF Qwen2/Qwen3/Gemma checkpoint
    directory (offline; parallels hf_loader.load_encoder_from_dir)."""
    import json
    import os

    from .hf_loader import (_load_state_dict, decoder_arch_from_config,
                            load_decoder_params)
    from .tokenizer import load_hf_tokenizer

    with open(os.path.join(path, "config.json")) as f:
        cfg = json.load(f)
    arch = decoder_arch_from_config(cfg)
    params = load_decoder_params(_load_state_dict(path), arch)
    try:
        tokenizer = load_hf_tokenizer(path)
    except Exception:
        import logging

        logging.getLogger(__name__).warning(
            "checkpoint %s has weights but no loadable tokenizer; falling "
            "back to the hash tokenizer (plumbing mode)", path,
            exc_info=True)
        tokenizer = None
    kw = {}
    if dtype is not None:
        kw["dtype"] = dtype
    return DecoderEmbedder(arch=arch, params=params, tokenizer=tokenizer,
                           max_length=max_length, instruction=instruction,
                           batch_size=batch_size, **kw)
