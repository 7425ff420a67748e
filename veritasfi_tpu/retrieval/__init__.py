from .dense import DenseRetriever
from .m3_scorer import M3CandidateScorer

__all__ = ["DenseRetriever", "M3CandidateScorer"]
