"""Sparse BM25 retrieval over the chunk corpus (host-side).

Replaces the reference's bm25s + PyStemmer stack
(reference: src/utils/bm25Retriever.py:10-87): english stopwords + Porter
stemming, an eagerly-scored sparse index persisted to disk, and
``invoke(query, k) -> (row_ids, scores)`` over the full corpus.

Design: like bm25s, the BM25 contribution of every (doc, term) pair is
precomputed at build time into a CSC matrix, so query scoring is a sparse
column-sum — O(nnz of the query's terms). The corpus rows are CorpusIndex
row indices (the reference's bm25 internal ids map 1:1 to chroma insertion
order the same way). BM25 stays host-side deliberately: the corpus is
string-heavy and tiny next to the dense path (SURVEY.md §7.1).

Scoring variants:
  * "lucene" (default, bm25s default): idf = ln(1 + (N-df+0.5)/(df+0.5)),
    tf_part = tf / (tf + k1 * (1 - b + b * dl/avgdl))
  * "robertson": same with a (k1+1) numerator factor.
"""

from __future__ import annotations

import json
import os
import re
from collections import Counter
from typing import List, Optional, Tuple

import numpy as np
import scipy.sparse as sp

from .stemmer import porter_stem

_TOKEN_RE = re.compile(r"(?u)\b\w\w+\b")

# Standard english stopword list (bm25s uses the classic english set).
STOPWORDS = frozenset(
    """a about above after again against all am an and any are as at be because
    been before being below between both but by can did do does doing don down
    during each few for from further had has have having he her here hers
    herself him himself his how i if in into is it its itself just me more
    most my myself no nor not now of off on once only or other our ours
    ourselves out over own s same she should so some such t than that the
    their theirs them themselves then there these they this those through to
    too under until up very was we were what when where which while who whom
    why will with you your yours yourself yourselves""".split()
)


def tokenize(text: str, stem: bool = True) -> List[str]:
    toks = [t for t in _TOKEN_RE.findall(text.lower()) if t not in STOPWORDS]
    if stem:
        toks = [porter_stem(t) for t in toks]
    return toks


class BM25Index:
    """Eagerly-scored sparse BM25 index."""

    def __init__(
        self,
        score_matrix: sp.csc_matrix,
        vocab: dict,
        doc_ids: List[str],
        k1: float = 1.5,
        b: float = 0.75,
        variant: str = "lucene",
    ) -> None:
        self.scores = score_matrix          # [N_docs, V] csc
        self.vocab = vocab                  # term -> column
        self.doc_ids = doc_ids
        self.k1, self.b, self.variant = k1, b, variant
        self.num_docs = score_matrix.shape[0]

    # ------------------------------------------------------------------
    @classmethod
    def build(
        cls,
        corpus: List[str],
        doc_ids: Optional[List[str]] = None,
        k1: float = 1.5,
        b: float = 0.75,
        variant: str = "lucene",
    ) -> "BM25Index":
        n = len(corpus)
        doc_ids = doc_ids if doc_ids is not None else [str(i) for i in range(n)]
        token_lists = [tokenize(t) for t in corpus]
        doc_len = np.array([len(t) for t in token_lists], np.float32)
        avgdl = max(doc_len.mean(), 1e-9) if n else 1.0

        vocab: dict = {}
        rows, cols, tfs = [], [], []
        for i, toks in enumerate(token_lists):
            for term, tf in Counter(toks).items():
                col = vocab.setdefault(term, len(vocab))
                rows.append(i)
                cols.append(col)
                tfs.append(tf)
        v = len(vocab)
        tf_mat = sp.csr_matrix(
            (np.array(tfs, np.float32), (rows, cols)), shape=(n, v)
        )
        df = np.bincount(tf_mat.indices, minlength=v).astype(np.float32)
        idf = np.log(1.0 + (n - df + 0.5) / (df + 0.5))

        # eager per-element score
        coo = tf_mat.tocoo()
        norm = k1 * (1 - b + b * doc_len[coo.row] / avgdl)
        tf_part = coo.data / (coo.data + norm)
        if variant == "robertson":
            tf_part = tf_part * (k1 + 1)
        data = idf[coo.col] * tf_part
        score_matrix = sp.csc_matrix((data, (coo.row, coo.col)), shape=(n, v))
        return cls(score_matrix, vocab, doc_ids, k1, b, variant)

    # ------------------------------------------------------------------
    def get_scores(self, query: str) -> np.ndarray:
        """BM25 score of every document for the query (dense [N])."""
        qcols = [self.vocab[t] for t in tokenize(query) if t in self.vocab]
        if not qcols:
            return np.zeros(self.num_docs, np.float32)
        out = np.zeros(self.num_docs, np.float32)
        m = self.scores
        for c in qcols:  # duplicates count once per occurrence, like bm25s
            start, end = m.indptr[c], m.indptr[c + 1]
            out[m.indices[start:end]] += m.data[start:end]
        return out

    def invoke(self, query: str, k: int) -> Tuple[np.ndarray, np.ndarray]:
        """(row_indices, scores) of the top-k docs, descending score with
        ascending-index tie-break (deterministic, unlike bm25s' partition).

        API parity: reference BM25Retriever.invoke returns (ids, scores)
        (bm25Retriever.py:50-87)."""
        scores = self.get_scores(query)
        k = min(k, self.num_docs)
        nz = np.nonzero(scores > 0)[0]
        if len(nz) >= k:
            # only positive-score docs can make the cut: sort those instead
            # of lexsorting the whole corpus (exact same ordering — the
            # excluded docs all score 0, below any included one)
            sub = np.lexsort((nz, -scores[nz]))[:k]
            order = nz[sub]
        else:
            order = np.lexsort((np.arange(self.num_docs), -scores))[:k]
        return order.astype(np.int64), scores[order]

    # ------------------------------------------------------------------
    def save(self, dir_path: str) -> None:
        os.makedirs(dir_path, exist_ok=True)
        sp.save_npz(os.path.join(dir_path, "scores.npz"), self.scores)
        with open(os.path.join(dir_path, "meta.json"), "w", encoding="utf-8") as f:
            json.dump(
                {
                    "vocab": self.vocab,
                    "doc_ids": self.doc_ids,
                    "k1": self.k1,
                    "b": self.b,
                    "variant": self.variant,
                },
                f,
                ensure_ascii=False,
            )

    @classmethod
    def load(cls, dir_path: str) -> "BM25Index":
        scores = sp.load_npz(os.path.join(dir_path, "scores.npz")).tocsc()
        with open(os.path.join(dir_path, "meta.json"), encoding="utf-8") as f:
            meta = json.load(f)
        return cls(scores, meta["vocab"], meta["doc_ids"], meta["k1"],
                   meta["b"], meta["variant"])
