"""EnsembleRetriever — the tripartite multi-path retrieval engine.

Behavioral parity target: reference src/utils/ensembleRetriever.py:16-233.
Three paths, each guarded by its k>0, fused by dedup-union over a shared
seen-set (NOT score fusion; ranking is deferred to the reranker):

  (a) dense content path — queries = [input] + hyde_chunks batched in ONE
      device launch (the reference loops FAISS per query,
      ensembleRetriever.py:64-67); per hit: whole-bundle gather when
      bundle_id set (CSR lookup, vs the reference's O(N) scan at :81),
      neighbor prev/next expansion when score > 0.72 with neighbor accept
      score > 0.66, depth cutoff 2048, and bundle cap 4 (:86-109);
  (b) title-summary path — dense search over title embeddings with the
      original input only, mapping each title to all chunks carrying it
      (CSR lookup vs O(N) scan at :145);
  (c) BM25 path — sparse scores over the full corpus, top bm25_k (:187-229).

Output is the reference chunk-dict schema exactly
(``retriever/score/page_content/metadata/bundle_id`` with a running output
bundle counter, :121-131), so downstream rerank/serving match bit-for-bit.

TPU-first differences (same observable outputs):
  * one batched jitted search per request instead of per-query FAISS calls;
  * the depth-2048 id->score table (:66-68) is replaced by exact
    ``scores_at`` + ``rank_of`` probes of just the neighbors walked;
  * bundle/title membership via precomputed CSR inverted maps;
  * fusion bookkeeping (seen-set walk over <= ~60 hits) stays host-side —
    it is branch-heavy string-free pointer chasing over tiny data.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..ingest.corpus import CorpusIndex, normalize_rows
from ..ops.similarity import cosine_similarity_matrix
from ..utils.profiler import profiler
from .bm25 import BM25Index
from .dense import DenseRetriever


class EnsembleRetriever:
    def __init__(
        self,
        corpus: CorpusIndex,
        embed_fn,
        bm25: Optional[BM25Index] = None,
        k: int = 10,
        faiss_k: Optional[int] = None,
        bm25_k: Optional[int] = None,
        faiss_ts_k: Optional[int] = None,
        enable_expand: bool = False,
        depth: int = 2048,
        expand_trigger: float = 0.72,
        expand_accept: float = 0.66,
        expand_max_chunks: int = 4,
    ) -> None:
        self.corpus = corpus
        self.embed_fn = embed_fn
        self.faiss_k = faiss_k if faiss_k is not None else k
        self.bm25_k = bm25_k if bm25_k is not None else k
        self.faiss_ts_k = faiss_ts_k if faiss_ts_k is not None else k
        self.enable_expand = enable_expand
        self.depth = depth
        self.expand_trigger = expand_trigger
        self.expand_accept = expand_accept
        self.expand_max_chunks = expand_max_chunks

        self.dense = DenseRetriever(corpus.embeddings, embed_fn)
        self.ts_dense = (
            DenseRetriever(corpus.ts_embeddings, embed_fn)
            if corpus.ts_embeddings is not None and len(corpus.ts_embeddings)
            else None
        )
        self.bm25 = bm25
        self.num_chunk = corpus.num_chunks

    # ------------------------------------------------------------------
    @profiler.profile_function(name="retrieve")
    def invoke(self, input: str, hyde_chunks: List[str]) -> List[Dict]:
        """Multi-path retrieve; returns reference-schema chunk dicts."""
        seen_ids: set = set()
        chunk_list: List[Dict] = []
        bundle_cnt = 0

        if self.faiss_k > 0 and self.num_chunk:
            with profiler.span("retrieve_faiss"):
                bundle_cnt = self._dense_path(
                    input, hyde_chunks, seen_ids, chunk_list, bundle_cnt
                )

        if self.faiss_ts_k > 0 and self.ts_dense is not None:
            with profiler.span("retrieve_faiss_ts"):
                bundle_cnt = self._title_path(
                    input, seen_ids, chunk_list, bundle_cnt
                )

        if self.bm25_k > 0 and self.bm25 is not None:
            with profiler.span("retrieve_bm25"):
                bundle_cnt = self._bm25_path(
                    input, seen_ids, chunk_list, bundle_cnt
                )

        profiler.add_metric("retrieved_chunks", len(chunk_list))
        return chunk_list

    # ------------------------------------------------------------------
    def _emit(
        self,
        chunk_list: List[Dict],
        rows: Sequence[int],
        retriever: str,
        score: float,
        bundle_cnt: int,
    ) -> None:
        for r in rows:
            chunk_list.append(
                {
                    "retriever": retriever,
                    "score": float(score),
                    "page_content": self.corpus.texts[r],
                    "metadata": self.corpus.metadata(r),
                    "bundle_id": bundle_cnt,
                    # engine extension: corpus row, so rerank fusion can reuse
                    # retrieval embeddings instead of re-embedding
                    "_row": int(r),
                }
            )

    def _gather_bundle(self, idx: int, seen_ids: set) -> List[int]:
        """ids = whole bundle if the hit carries one, else [idx]
        (ensembleRetriever.py:77-83)."""
        code = int(self.corpus.bundle_code[idx])
        if code >= 0:
            rows = [int(r) for r in self.corpus.bundle_rows(code)]
            seen_ids.update(rows)
            return rows
        return [idx]

    # ------------------------------------------------------------------
    def _dense_path(
        self,
        input: str,
        hyde_chunks: List[str],
        seen_ids: set,
        chunk_list: List[Dict],
        bundle_cnt: int,
    ) -> int:
        inputs = [input] + list(hyde_chunks)
        q_emb = normalize_rows(np.asarray(self.embed_fn(inputs), np.float32))
        k = min(self.faiss_k, self.num_chunk)
        scores, idxs = self.dense.search(jnp.asarray(q_emb), k)
        scores = np.asarray(scores)
        idxs = np.asarray(idxs)

        neighbor_score = None
        if self.enable_expand:
            neighbor_score = self._neighbor_score_table(q_emb, idxs)

        for qi in range(len(inputs)):
            for idx, score in zip(idxs[qi], scores[qi]):
                idx = int(idx)
                if idx in seen_ids:
                    continue
                seen_ids.add(idx)
                ids = self._gather_bundle(idx, seen_ids)

                if score > self.expand_trigger and self.enable_expand:
                    self._expand(idx, ids, seen_ids, neighbor_score[qi])

                self._emit(chunk_list, ids, "FAISS", score, bundle_cnt)
                bundle_cnt += 1
        return bundle_cnt

    def _expand(
        self, idx: int, ids: List[int], seen_ids: set, score_of: Dict[int, float]
    ) -> None:
        """Walk the prev/next chain while the neighbor's deep-search score
        passes expand_accept and total ids < expand_max_chunks
        (ensembleRetriever.py:86-109). ``score_of`` maps neighbor row ->
        its exact score (0 if outside the search depth, matching the
        reference's effective_ids.get(_, 0))."""
        prev_id = int(self.corpus.prev_idx[idx])
        next_id = int(self.corpus.next_idx[idx])
        while len(ids) < self.expand_max_chunks:
            flag = False
            if prev_id >= 0:
                if (
                    score_of.get(prev_id, 0.0) > self.expand_accept
                    and prev_id not in seen_ids
                ):
                    flag = True
                    seen_ids.add(prev_id)
                    ids.insert(0, prev_id)
                    prev_id = int(self.corpus.prev_idx[prev_id])
            # NOTE: the reference checks the size cap only at the loop top
            # (ensembleRetriever.py:89), so prev+next accepted in the same
            # iteration can exceed it by one — preserved for parity.
            if next_id >= 0:
                if (
                    score_of.get(next_id, 0.0) > self.expand_accept
                    and next_id not in seen_ids
                ):
                    flag = True
                    seen_ids.add(next_id)
                    ids.append(next_id)
                    next_id = int(self.corpus.next_idx[next_id])
            if not flag:
                break

    def _neighbor_score_table(
        self, q_emb: np.ndarray, top_idx: np.ndarray
    ) -> List[Dict[int, float]]:
        """Exact scores of every prev/next-chain neighbor of every top hit,
        with the depth cutoff applied — one batched scores_at + rank_of
        launch replacing the reference's depth-2048 score dict
        (ensembleRetriever.py:66-68)."""
        q, k = top_idx.shape
        steps = self.expand_max_chunks - 1
        cand: List[List[int]] = []
        for qi in range(q):
            rows: List[int] = []
            for idx in top_idx[qi]:
                p = int(self.corpus.prev_idx[int(idx)])
                for _ in range(steps):
                    if p < 0:
                        break
                    rows.append(p)
                    p = int(self.corpus.prev_idx[p])
                nx = int(self.corpus.next_idx[int(idx)])
                for _ in range(steps):
                    if nx < 0:
                        break
                    rows.append(nx)
                    nx = int(self.corpus.next_idx[nx])
            cand.append(sorted(set(rows)))

        width = max((len(c) for c in cand), default=0)
        if width == 0:
            return [dict() for _ in range(q)]
        padded = np.zeros((q, width), np.int32)
        for qi, c in enumerate(cand):
            if c:
                padded[qi, : len(c)] = c
        qj = jnp.asarray(q_emb)
        ij = jnp.asarray(padded)
        s = np.asarray(self.dense.scores_at(qj, ij))
        r = np.asarray(self.dense.rank_of(qj, jnp.asarray(s)))
        tables: List[Dict[int, float]] = []
        for qi, c in enumerate(cand):
            tables.append(
                {
                    row: float(s[qi, j])
                    for j, row in enumerate(c)
                    if r[qi, j] < self.depth
                }
            )
        return tables

    # ------------------------------------------------------------------
    def _title_path(
        self, input: str, seen_ids: set, chunk_list: List[Dict], bundle_cnt: int
    ) -> int:
        q_emb = normalize_rows(np.asarray(self.embed_fn([input]), np.float32))
        k = min(self.faiss_ts_k, len(self.corpus.title_texts))
        scores, idxs = self.ts_dense.search(jnp.asarray(q_emb), k)
        for t_idx, score in zip(np.asarray(idxs)[0], np.asarray(scores)[0]):
            for idx in self.corpus.title_rows(int(t_idx)):
                idx = int(idx)
                if idx in seen_ids:
                    continue
                seen_ids.add(idx)
                ids = self._gather_bundle(idx, seen_ids)
                self._emit(chunk_list, ids, "Title Summary", score, bundle_cnt)
                bundle_cnt += 1
        return bundle_cnt

    def _bm25_path(
        self, input: str, seen_ids: set, chunk_list: List[Dict], bundle_cnt: int
    ) -> int:
        bm25_ids, bm25_scores = self.bm25.invoke(input, self.num_chunk)
        for idx, score in zip(bm25_ids[: self.bm25_k], bm25_scores[: self.bm25_k]):
            idx = int(idx)
            if idx in seen_ids:
                continue
            seen_ids.add(idx)
            ids = self._gather_bundle(idx, seen_ids)
            self._emit(chunk_list, ids, "BM25", score, bundle_cnt)
            bundle_cnt += 1
        return bundle_cnt

    # ------------------------------------------------------------------
    # Reranker-facing similarity helpers (reference:
    # ensembleRetriever.py:235-281). compute_similarity_mtx_rows reuses
    # corpus embeddings by row (the reference re-embeds every chunk text on
    # GPU — pure waste we design away); the text variant is kept for API
    # parity with callers holding only strings.
    def compute_similarity_mtx_rows(self, rows: Sequence[int]) -> np.ndarray:
        emb = self.corpus.embeddings[np.asarray(rows, np.int64)]
        return np.asarray(cosine_similarity_matrix(jnp.asarray(emb)))

    def compute_similarity_mtx(self, chunks: List[str]) -> np.ndarray:
        emb = normalize_rows(np.asarray(self.embed_fn(chunks), np.float32))
        return np.asarray(cosine_similarity_matrix(jnp.asarray(emb)))
