from .mesh import (
    corpus_sharding,
    distributed_topk,
    make_mesh,
    replicated,
    shard_corpus,
)

__all__ = ["make_mesh", "shard_corpus", "corpus_sharding", "replicated",
           "distributed_topk"]
