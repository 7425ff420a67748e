from .bm25_native import NativeBM25, native_available

__all__ = ["NativeBM25", "native_available"]
