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
        self.doc_ids = doc_ids if doc_ids is not None else [
            str(i) for i in range(len(corpus))]
        encoded = [t.encode("utf-8") for t in corpus]
        arr = (ctypes.c_char_p * len(encoded))(*encoded)
        self._handle = lib.vfi_bm25_build(
            arr, len(encoded), k1, b, 1 if variant == "robertson" else 0)
        self.num_docs = len(encoded)

    def __del__(self):
        handle = getattr(self, "_handle", None)
        if handle:
            self._lib.vfi_bm25_free(handle)
            self._handle = None

    def get_scores(self, query: str) -> np.ndarray:
        out = np.zeros(self.num_docs, np.float32)
        self._lib.vfi_bm25_scores(
            self._handle, query.encode("utf-8"),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out

    def invoke(self, query: str, k: int) -> Tuple[np.ndarray, np.ndarray]:
        k = min(k, self.num_docs)
        ids = np.zeros(k, np.int32)
        scores = np.zeros(k, np.float32)
        got = self._lib.vfi_bm25_topk(
            self._handle, query.encode("utf-8"), k,
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return ids[:got].astype(np.int64), scores[:got]
