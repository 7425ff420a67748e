from .topk import dense_topk, dense_topk_chunked, rank_of, scores_at
from .similarity import cosine_similarity_matrix

__all__ = [
    "dense_topk",
    "dense_topk_chunked",
    "scores_at",
    "rank_of",
    "cosine_similarity_matrix",
]
