from .fusion import chunk_time_scores, rank_chunk, select_content
from .batcher import ContinuousBatcher

__all__ = ["rank_chunk", "chunk_time_scores", "select_content",
           "ContinuousBatcher"]
