from .dense import DenseRetriever

__all__ = ["DenseRetriever"]
