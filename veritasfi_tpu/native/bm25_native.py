"""ctypes bindings for the native C++ BM25 engine (bm25.cpp).

The shared library is built on first use with g++ (cached next to the
source); when no toolchain is available the caller falls back to the pure
scipy implementation in retrieval/bm25.py. Scoring semantics are identical
on ASCII corpora (same tokenizer, Porter stemmer, stopwords, lucene
formula — asserted by tests/test_native_bm25.py); the C++ tokenizer is
byte-wise ASCII, so NativeBM25 REFUSES non-ASCII corpora (ValueError) and
callers fall back to the Unicode-correct Python engine.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "bm25.cpp")
_LIB = os.path.join(_HERE, "libvfi_bm25.so")
_build_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[str]:
    try:
        src_mtime = os.path.getmtime(_SRC)
    except OSError:
        # source absent (e.g. a deployed tree shipping only the .so):
        # a cached library is still perfectly usable
        return _LIB if os.path.exists(_LIB) else None
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= src_mtime:
        return _LIB
    # build to a temp path + atomic rename: another process dlopening the
    # final path must never see a partially written library
    tmp = f"{_LIB}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        os.replace(tmp, _LIB)
        return _LIB
    except Exception as e:
        logger.warning("native bm25 build failed (%s); using Python BM25", e)
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _build_lock:
        if _lib is not None or _build_failed:
            return _lib
        path = _build()
        if path is None:
            _build_failed = True
            return None
        lib = ctypes.CDLL(path)
        lib.vfi_bm25_build.restype = ctypes.c_void_p
        lib.vfi_bm25_build.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
            ctypes.c_double, ctypes.c_double, ctypes.c_int32]
        lib.vfi_bm25_free.argtypes = [ctypes.c_void_p]
        lib.vfi_bm25_num_docs.restype = ctypes.c_int32
        lib.vfi_bm25_num_docs.argtypes = [ctypes.c_void_p]
        lib.vfi_bm25_scores.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float)]
        lib.vfi_bm25_topk.restype = ctypes.c_int32
        lib.vfi_bm25_topk.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float)]
        lib.vfi_bm25_build_tokens.restype = ctypes.c_void_p
        lib.vfi_bm25_build_tokens.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32, ctypes.c_int32,
            ctypes.c_double, ctypes.c_double, ctypes.c_int32]
        lib.vfi_bm25_scores_ids.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float)]
        lib.vfi_bm25_topk_ids.restype = ctypes.c_int32
        lib.vfi_bm25_topk_ids.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float)]
        lib.vfi_bm25_df.restype = ctypes.c_int64
        lib.vfi_bm25_df.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


class NativeBM25:
    """BM25Index-compatible engine backed by the C++ library."""

    def __init__(self, corpus: List[str], doc_ids: Optional[List[str]] = None,
                 k1: float = 1.5, b: float = 0.75,
                 variant: str = "lucene") -> None:
        lib = _load()
        if lib is None:
            raise RuntimeError("native bm25 library unavailable")
        # the C++ tokenizer is byte-wise ASCII; scoring a non-ASCII corpus
        # there would silently diverge from the Unicode Python engine
        # (accented/CJK tokens split per byte) — refuse so the caller's
        # fallback keeps rankings environment-independent
        for t in corpus:
            if not t.isascii():
                raise ValueError(
                    "native BM25 only matches the Python engine on ASCII "
                    "corpora; falling back keeps scores identical")
        self._lib = lib
        # the C++ query path reuses per-handle scratch/cands buffers
        # ("one query at a time per handle"); ctypes calls release the
        # GIL, so concurrent server threads sharing one handle must
        # serialize here — a race corrupts the scratch's all-zero-between-
        # calls invariant PERMANENTLY (every later query misscores)
        self._query_lock = threading.Lock()
        self.doc_ids = doc_ids if doc_ids is not None else [
            str(i) for i in range(len(corpus))]
        encoded = [t.encode("utf-8") for t in corpus]
        arr = (ctypes.c_char_p * len(encoded))(*encoded)
        self._handle = lib.vfi_bm25_build(
            arr, len(encoded), k1, b, 1 if variant == "robertson" else 0)
        self.num_docs = len(encoded)

    @classmethod
    def from_token_ids(cls, doc_indptr: np.ndarray, token_ids: np.ndarray,
                       vocab_size: int,
                       doc_ids: Optional[List[str]] = None,
                       k1: float = 1.5, b: float = 0.75,
                       variant: str = "lucene") -> "NativeBM25":
        """Build from pre-tokenized docs: ``token_ids[doc_indptr[d]:
        doc_indptr[d+1]]`` are doc d's term ids. Query-time code is shared
        with the text build exactly; queries go through ``invoke_ids`` /
        ``get_scores_ids`` (the handle has no string vocabulary).

        This is the corpus-scale path — a 10M-doc fixture never
        materializes 10M strings, and production callers with their own
        tokenizers (or a persisted token cache) skip re-tokenization."""
        lib = _load()
        if lib is None:
            raise RuntimeError("native bm25 library unavailable")
        self = cls.__new__(cls)
        self._lib = lib
        self._query_lock = threading.Lock()
        indptr = np.ascontiguousarray(doc_indptr, np.int64)
        tokens = np.ascontiguousarray(token_ids, np.int32)
        n_docs = len(indptr) - 1
        if int(indptr[-1]) != len(tokens):
            raise ValueError("doc_indptr[-1] must equal len(token_ids)")
        self.doc_ids = (doc_ids if doc_ids is not None
                        else [str(i) for i in range(n_docs)])
        self._handle = lib.vfi_bm25_build_tokens(
            indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            tokens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n_docs, int(vocab_size), k1, b,
            1 if variant == "robertson" else 0)
        self.num_docs = n_docs
        return self

    def __del__(self):
        handle = getattr(self, "_handle", None)
        if handle:
            self._lib.vfi_bm25_free(handle)
            self._handle = None

    def get_scores(self, query: str) -> np.ndarray:
        out = np.zeros(self.num_docs, np.float32)
        with self._query_lock:
            self._lib.vfi_bm25_scores(
                self._handle, query.encode("utf-8"),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out

    def get_scores_ids(self, query_ids) -> np.ndarray:
        qids = np.ascontiguousarray(query_ids, np.int32)
        out = np.zeros(self.num_docs, np.float32)
        with self._query_lock:
            self._lib.vfi_bm25_scores_ids(
                self._handle,
                qids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                len(qids),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out

    def invoke(self, query: str, k: int) -> Tuple[np.ndarray, np.ndarray]:
        k = min(k, self.num_docs)
        ids = np.zeros(k, np.int32)
        scores = np.zeros(k, np.float32)
        with self._query_lock:
            got = self._lib.vfi_bm25_topk(
                self._handle, query.encode("utf-8"), k,
                ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return ids[:got].astype(np.int64), scores[:got]

    def df(self, term_id: int) -> int:
        """Posting-list length (document frequency) of a term id; -1 when
        the id is out of range. Benchmarks use this to report how many
        postings a query touches — the sparse leg's real cost driver."""
        return int(self._lib.vfi_bm25_df(self._handle, int(term_id)))

    def invoke_ids(self, query_ids, k: int) -> Tuple[np.ndarray, np.ndarray]:
        """Top-k for a pre-tokenized query (term ids; unknown terms < 0
        are ignored). Same ordering contract as ``invoke``."""
        qids = np.ascontiguousarray(query_ids, np.int32)
        k = min(k, self.num_docs)
        ids = np.zeros(k, np.int32)
        scores = np.zeros(k, np.float32)
        with self._query_lock:
            got = self._lib.vfi_bm25_topk_ids(
                self._handle,
                qids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                len(qids), k,
                ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return ids[:got].astype(np.int64), scores[:got]
