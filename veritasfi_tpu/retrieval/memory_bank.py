"""High-frequency QA memory bank (expert-curated Q->A pairs).

Capability parity with reference src/utils/frequentQA.py:
  * two SQLite stores — ``frequent_qa_pairs`` (question, question_rewritten,
    answer, is_active) and ``qa_table`` (question + per-period value columns
    like ``Y2024_Q3``, unpivoted by ``periods_to_dict``);
  * question normalization stripping CJK punctuation and the company name
    (frequentQA.py:8-15);
  * a SequenceMatcher matcher with ratio >= 0.55 (frequentQA.py:132-160);
  * a from-scratch BM25 matcher (k1=1.5, b=0.75, epsilon=0.25) with score
    >= 3.0 (frequentQA.py:68-117,162-227).

Performance redesign (same results): the reference re-reads the whole table
and REBUILDS the BM25 index on every lookup (frequentQA.py:162-193). Here
rows and BM25 statistics are cached in memory and invalidated on database
mtime change, and an exact-match hash gives an O(1) fast path.
"""

from __future__ import annotations

import math
import os
import re
import sqlite3
from collections import Counter
from difflib import SequenceMatcher
from typing import Dict, List, Optional, Tuple

_CJK_PUNCT = r'[，。、？！：；""' "''（）【】［］｛｝《》〈〉「」『』〔〕…—－～]"

FIXED_COLS = {"question", "question_rewritten", "category", "metadata", "id"}
META_COLS = {"last_updated", "updated_by", "is_active"}


def normalize_question(question: str,
                       company_pattern: str = r"(?i)zeekr(?:'s)?") -> str:
    """Strip CJK punctuation and the company name (frequentQA.py:8-15).

    NOTE (preserved reference behavior): the punctuation strip is applied to
    a throwaway and the company strip to the ORIGINAL question — the
    reference overwrites q with ``re.sub(pattern, '', question)`` at
    frequentQA.py:14, so CJK punctuation actually survives normalization.
    """
    q = question.strip()
    q = re.sub(_CJK_PUNCT, " ", q)
    q = re.sub(company_pattern, "", question)
    return q


def calculate_similarity(a: str, b: str) -> float:
    return SequenceMatcher(None, a, b).ratio()


class MemoryBankBM25:
    """From-scratch BM25 over whitespace-tokenized normalized questions
    (k1=1.5, b=0.75, epsilon=0.25 — frequentQA.py:68-117). epsilon is added
    inside the log as in the reference."""

    def __init__(self, corpus: List[List[str]], k1: float = 1.5,
                 b: float = 0.75, epsilon: float = 0.25) -> None:
        self.k1, self.b, self.epsilon = k1, b, epsilon
        self.corpus_size = len(corpus)
        self.avg_doc_len = (
            sum(len(doc) for doc in corpus) / self.corpus_size
            if self.corpus_size else 0.0
        )
        self.doc_len = [len(doc) for doc in corpus]
        self.doc_freqs = [Counter(doc) for doc in corpus]
        df: Dict[str, int] = {}
        for freq in self.doc_freqs:
            for word in freq:
                df[word] = df.get(word, 0) + 1
        self.idf = {
            w: math.log((self.corpus_size - d + 0.5) / (d + 0.5) + epsilon)
            for w, d in df.items()
        }

    def score(self, query: List[str], index: int) -> float:
        score = 0.0
        doc_len = self.doc_len[index]
        freqs = self.doc_freqs[index]
        for word in query:
            if word not in freqs:
                continue
            freq = freqs[word]
            num = self.idf[word] * freq * (self.k1 + 1)
            den = freq + self.k1 * (1 - self.b + self.b * doc_len / self.avg_doc_len)
            score += num / den
        return score

    def get_scores(self, query: List[str]) -> List[float]:
        return [self.score(query, i) for i in range(self.corpus_size)]


def periods_to_dict(row: Dict[str, object]) -> Dict[str, str]:
    """Unpivot a qa_table row's period columns (frequentQA.py:29-64)."""
    skip = FIXED_COLS | META_COLS
    out: Dict[str, str] = {}
    for col, val in row.items():
        if col in skip:
            continue
        if val in (None, "NULL"):
            val = ""
        out[col] = val
    return out


class _TableCache:
    """Rows + BM25 stats cached per database file, invalidated on mtime."""

    def __init__(self) -> None:
        self.mtime: Optional[float] = None
        self.rows: List[Dict] = []
        self.bm25: Optional[MemoryBankBM25] = None
        self.normalized: List[str] = []
        self.exact: Dict[str, int] = {}


class MemoryBank:
    """QuestionSimilarityFinder equivalent over the two SQLite stores."""

    def __init__(self, db_path: Optional[str] = None,
                 table_path: Optional[str] = None,
                 company_pattern: str = r"(?i)zeekr(?:'s)?") -> None:
        self.db_path = db_path
        self.table_path = table_path
        self.company_pattern = company_pattern
        self._caches: Dict[str, _TableCache] = {}

    # -- storage ---------------------------------------------------------
    @staticmethod
    def create_db(db_path: str, pairs: List[Dict]) -> None:
        """Create a reference-format frequent_qa_pairs database."""
        conn = sqlite3.connect(db_path)
        conn.execute(
            "CREATE TABLE IF NOT EXISTS frequent_qa_pairs ("
            "id INTEGER PRIMARY KEY, question TEXT, question_rewritten TEXT,"
            "answer TEXT, is_active BOOLEAN DEFAULT TRUE)"
        )
        conn.executemany(
            "INSERT INTO frequent_qa_pairs (question, question_rewritten,"
            " answer, is_active) VALUES (?, ?, ?, ?)",
            [(p["question"], p.get("question_rewritten", p["question"]),
              p["answer"], p.get("is_active", True)) for p in pairs],
        )
        conn.commit()
        conn.close()

    @staticmethod
    def create_table_db(table_path: str, rows: List[Dict],
                        period_columns: List[str]) -> None:
        """Create a reference-format qa_table database with period columns."""
        conn = sqlite3.connect(table_path)
        cols = ", ".join(f'"{c}" TEXT' for c in period_columns)
        conn.execute(
            f"CREATE TABLE IF NOT EXISTS qa_table (id INTEGER PRIMARY KEY,"
            f" question TEXT, question_rewritten TEXT, {cols},"
            f" is_active BOOLEAN DEFAULT TRUE)"
        )
        for r in rows:
            keys = ["question", "question_rewritten"] + [
                c for c in period_columns if c in r
            ]
            placeholders = ", ".join("?" for _ in keys)
            names = ", ".join(f'"{k}"' for k in keys)
            conn.execute(
                f"INSERT INTO qa_table ({names}, is_active) VALUES"
                f" ({placeholders}, ?)",
                [r.get(k) for k in keys] + [r.get("is_active", True)],
            )
        conn.commit()
        conn.close()

    # -- caching ----------------------------------------------------------
    def _load(self, path: str, table: str) -> _TableCache:
        # keyed by (path, table): both stores may live in ONE sqlite file
        # (a path-only key would serve frequent_qa_pairs rows to the
        # qa_table matchers)
        cache = self._caches.get((path, table))
        mtime = os.path.getmtime(path)
        if cache is not None and cache.mtime == mtime:
            return cache
        cache = _TableCache()
        cache.mtime = mtime
        conn = sqlite3.connect(path)
        conn.row_factory = sqlite3.Row
        rows = conn.execute(
            f"SELECT * FROM {table} WHERE is_active = TRUE"
        ).fetchall()
        conn.close()
        cache.rows = [dict(r) for r in rows]
        # coalesce NULL question_rewritten (a row inserted without the key
        # stores NULL; None.strip() inside normalize_question would break
        # every lookup on the table, not just the bad row)
        cache.normalized = [
            normalize_question(r["question_rewritten"] or r["question"]
                               or "", self.company_pattern)
            for r in cache.rows
        ]
        cache.bm25 = MemoryBankBM25([n.split() for n in cache.normalized])
        cache.exact = {n: i for i, n in enumerate(cache.normalized)}
        self._caches[(path, table)] = cache
        return cache

    # -- matchers (reference result-tuple shape) ---------------------------
    def _seq_match(self, cache: _TableCache, question: str, top_n: int,
                   threshold: float, payload) -> List[Tuple]:
        qn = normalize_question(question, self.company_pattern)
        results = []
        for i, row in enumerate(cache.rows):
            sim = calculate_similarity(qn, cache.normalized[i])
            if sim >= threshold:
                results.append(
                    (row["id"], row["question"], row["question_rewritten"],
                     payload(row), sim, [qn, cache.normalized[i]])
                )
        results.sort(key=lambda x: x[4], reverse=True)
        return results[:top_n]

    def _bm25_match(self, cache: _TableCache, question: str, top_n: int,
                    threshold: float, payload) -> List[Tuple]:
        qn = normalize_question(question, self.company_pattern)
        if not cache.rows:
            return []
        scores = cache.bm25.get_scores(qn.split())
        results = []
        for i, score in enumerate(scores):
            if score >= threshold:
                row = cache.rows[i]
                results.append(
                    (row["id"], row["question"], row["question_rewritten"],
                     payload(row), score, [qn, cache.normalized[i]])
                )
        results.sort(key=lambda x: x[4], reverse=True)
        return results[:top_n]

    def exact_match(self, question: str) -> Optional[Dict]:
        """O(1) exact-match fast path (framework addition; BASELINE
        north-star's on-host hash lookup)."""
        if not self.db_path:
            return None
        cache = self._load(self.db_path, "frequent_qa_pairs")
        i = cache.exact.get(normalize_question(question, self.company_pattern))
        # copy: handing out the cached dict by reference would let caller
        # mutation poison every later request until the next mtime change
        return dict(cache.rows[i]) if i is not None else None

    # reference API (frequentQA.py:132,147,162,195)
    def find_similar_questions_db(self, question: str, top_n: int = 5,
                                  threshold: float = 0.55) -> List[Tuple]:
        cache = self._load(self.db_path, "frequent_qa_pairs")
        return self._seq_match(cache, question, top_n, threshold,
                               lambda r: r["answer"])

    def find_similar_questions_table(self, question: str, top_n: int = 5,
                                     threshold: float = 0.55) -> List[Tuple]:
        cache = self._load(self.table_path, "qa_table")
        return self._seq_match(cache, question, top_n, threshold,
                               periods_to_dict)

    def find_similar_questions_bm25_db(self, question: str, top_n: int = 5,
                                       threshold: float = 3.0) -> List[Tuple]:
        cache = self._load(self.db_path, "frequent_qa_pairs")
        return self._bm25_match(cache, question, top_n, threshold,
                                lambda r: r["answer"])

    def find_similar_questions_bm25_table(self, question: str, top_n: int = 5,
                                          threshold: float = 3.0) -> List[Tuple]:
        cache = self._load(self.table_path, "qa_table")
        return self._bm25_match(cache, question, top_n, threshold,
                                periods_to_dict)

    def get_full_qa_by_id(self, question_id: int) -> Optional[Dict]:
        conn = sqlite3.connect(self.db_path)
        conn.row_factory = sqlite3.Row
        row = conn.execute(
            "SELECT * FROM frequent_qa_pairs WHERE id = ?", (question_id,)
        ).fetchone()
        conn.close()
        return dict(row) if row else None
