"""Deterministic lexical hash embedder.

A dependency- and weight-free embedding function: signed feature hashing of
unigram + bigram tokens into a D-dim vector, L2-normalized. Token overlap
produces cosine similarity, so retrieval behaves sensibly in tests,
deterministic parity fixtures, and corpus-scale benchmarks where trained
encoder weights are unavailable (this image has no model weights).

Not a semantic model — production uses models.encoder.TextEncoder with
converted BGE weights.
"""

from __future__ import annotations

from typing import List

import numpy as np

from .tokenizer import basic_tokens, _fnv1a


class HashEmbedder:
    def __init__(self, dim: int = 256, bigrams: bool = True) -> None:
        self.dim = dim
        self.bigrams = bigrams

    def _features(self, text: str) -> List[str]:
        toks = basic_tokens(text)
        feats = list(toks)
        if self.bigrams:
            feats += [f"{a}_{b}" for a, b in zip(toks, toks[1:])]
        return feats

    def encode(self, texts: List[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), np.float32)
        for i, text in enumerate(texts):
            for feat in self._features(text):
                h = _fnv1a(feat)
                sign = 1.0 if (h >> 31) & 1 else -1.0
                out[i, h % self.dim] += sign
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        return out / np.maximum(norms, 1e-12)

    __call__ = encode

    def embed_query(self, text: str) -> List[float]:
        return self.encode([text])[0].tolist()
