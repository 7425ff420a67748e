"""Tokenizers for the encoder/reranker stacks.

Two paths:
  * ``load_hf_tokenizer`` — wraps a local HuggingFace tokenizer directory
    (offline; no downloads) for real BGE/Gemma vocabularies.
  * ``HashTokenizer`` — a deterministic, dependency-free fallback that hashes
    whitespace/punctuation tokens into the vocab range. Used by tests and
    random-weight benchmarks where the exact subword mapping is irrelevant.
"""

from __future__ import annotations

import re
from typing import Dict, List

import numpy as np

_TOKEN_RE = re.compile(r"[a-z0-9]+|[一-鿿]|[^\sa-z0-9]")


def basic_tokens(text: str) -> List[str]:
    """Lowercased word/CJK-char/punct tokens."""
    return _TOKEN_RE.findall(text.lower())


def _fnv1a(s: str) -> int:
    h = 0x811C9DC5
    for ch in s.encode("utf-8"):
        h ^= ch
        h = (h * 0x01000193) & 0xFFFFFFFF
    return h


class HashTokenizer:
    """Deterministic hashing tokenizer: token -> stable id in [n_special, vocab)."""

    def __init__(self, vocab_size: int, pad_id: int = 0, cls_id: int = 101,
                 sep_id: int = 102) -> None:
        if vocab_size < 256:
            raise ValueError("vocab_size too small for HashTokenizer")
        self.vocab_size = vocab_size
        self.pad_id = pad_id
        self.cls_id = cls_id % vocab_size
        self.sep_id = sep_id % vocab_size
        self._reserved = {self.pad_id, self.cls_id, self.sep_id}
        self._span = vocab_size - 200  # keep low ids free for specials
        self._id_cache: Dict[str, int] = {}

    def token_id(self, token: str) -> int:
        tid = self._id_cache.get(token)
        if tid is not None:
            return tid
        tid = 200 + _fnv1a(token) % self._span
        # avoid colliding with specials (can't happen with span>=200 offset,
        # but keep the guard for tiny vocabs)
        while tid in self._reserved:
            tid = (tid + 1) % self.vocab_size
        if len(self._id_cache) < 1_000_000:
            self._id_cache[token] = tid
        return tid

    def __call__(self, texts: List[str], max_length: int) -> Dict[str, np.ndarray]:
        rows = []
        for t in texts:
            ids = [self.cls_id] + [self.token_id(tok) for tok in basic_tokens(t)]
            ids = ids[: max_length - 1] + [self.sep_id]
            rows.append(ids)
        seq = max((len(r) for r in rows), default=0)
        input_ids = np.full((len(rows), seq), self.pad_id, np.int32)
        mask = np.zeros((len(rows), seq), np.int32)
        for i, r in enumerate(rows):
            input_ids[i, : len(r)] = r
            mask[i, : len(r)] = 1
        return {"input_ids": input_ids, "attention_mask": mask}

    def pair(self, a: str, b: str, max_a: int, max_b: int) -> List[int]:
        """(query, passage) pair encoding for the cross-encoder."""
        ta = [self.token_id(t) for t in basic_tokens(a)][: max_a]
        tb = [self.token_id(t) for t in basic_tokens(b)][: max_b]
        return [self.cls_id] + ta + [self.sep_id] + tb + [self.sep_id]


def load_hf_tokenizer(path: str):
    """Load a local HuggingFace tokenizer dir and adapt it to our interface."""
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(path, local_files_only=True)

    def call(texts: List[str], max_length: int) -> Dict[str, np.ndarray]:
        out = tok(texts, padding=True, truncation=True, max_length=max_length,
                  return_tensors="np")
        return {
            "input_ids": out["input_ids"].astype(np.int32),
            "attention_mask": out["attention_mask"].astype(np.int32),
        }

    call.hf = tok
    return call
