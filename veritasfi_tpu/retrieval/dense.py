"""Dense exact-search retriever (FAISS IndexFlatIP equivalent).

API-parity with the reference's FaissRetriever
(reference: src/utils/faissRetriever.py:8-38): the index is an L2-normalized
embedding matrix; ``invoke(queries, k)`` embeds all queries in one batched
forward and returns (indices, scores) per query.

TPU-native differences: the matrix lives in device HBM; search is one jitted
matmul + top-k (ops.topk); multi-query batches (original + HyDE) run in a
single launch instead of a Python loop; large corpora use the streaming
chunked kernel and, later, the fused Pallas MIPS kernel.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.topk import dense_topk, dense_topk_large, rank_of, scores_at
from ..ingest.corpus import normalize_rows

# Above this corpus size, avoid materializing [Q, N] scores.
_CHUNKED_THRESHOLD = 262_144


class DenseRetriever:
    def __init__(self, embeddings: np.ndarray, embed_fn, device=None,
                 dtype=None) -> None:
        """Args:
          embeddings: [N, D] corpus matrix (normalized here defensively,
            matching faiss.normalize_L2 at faissRetriever.py:21-23).
          embed_fn: callable List[str] -> [n, D] query embeddings.
          dtype: device storage dtype. None/float32 = exact FAISS parity;
            bfloat16 halves HBM footprint+traffic and routes large-corpus
            search through the fused Pallas MIPS kernel (normalization
            always happens in fp32 first, so bf16 only rounds the stored
            unit vectors).

        A ``jax.Array`` for ``embeddings`` is taken as ALREADY normalized
        and device-resident (the BASELINE-config-#5 shape: a 10M-row matrix
        generated/normalized on device — a host round-trip would move
        multiple GB over the transport); only the dtype cast still applies.
        """
        if isinstance(embeddings, jax.Array):
            self.corpus = (embeddings if dtype is None
                           else embeddings.astype(dtype))
        else:
            mat = normalize_rows(np.asarray(embeddings, np.float32))
            if dtype is not None:
                mat = mat.astype(dtype)
            self.corpus = jax.device_put(mat, device)
        self.embed_fn = embed_fn
        self.num_vectors = self.corpus.shape[0]

    # -- text API (reference-compatible) --------------------------------
    def invoke(self, queries: List[str], k: int) -> Tuple[np.ndarray, np.ndarray]:
        """Batched multi-query search; returns (indices [Q,k], scores [Q,k])
        in the reference's (indices, distances) order (faissRetriever.py:37-38)."""
        q = normalize_rows(np.asarray(self.embed_fn(queries), np.float32))
        scores, idx = self.search(jnp.asarray(q), k)
        return np.asarray(idx), np.asarray(scores)

    # -- array API (used by the jitted ensemble engine) ------------------
    def search(self, query_emb: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
        k = min(k, self.num_vectors)
        query_emb = query_emb.astype(self.corpus.dtype)
        if self.num_vectors > _CHUNKED_THRESHOLD:
            return dense_topk_large(self.corpus, query_emb, k)
        return dense_topk(self.corpus, query_emb, k)

    def scores_at(self, query_emb: jax.Array, idx: jax.Array) -> jax.Array:
        return scores_at(self.corpus, query_emb.astype(self.corpus.dtype), idx)

    def rank_of(self, query_emb: jax.Array, cand_scores: jax.Array) -> jax.Array:
        return rank_of(self.corpus, query_emb.astype(self.corpus.dtype),
                       cand_scores)
