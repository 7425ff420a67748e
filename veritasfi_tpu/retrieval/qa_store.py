"""Vector-matched QA memory store.

Capability parity with reference src/utils/QARetriever.py (QAChromaLoader):
QA entries stored as JSON documents {question, question_rewritten, data}
with prev/next metadata, queried by cosine similarity, parsed top-n results.

TPU-native storage: instead of a Chroma/hnswlib database, the store is a
small L2-normalized embedding matrix + JSONL docs persisted to a directory,
searched with the same jitted exact top-k kernel as the main corpus (the
memory bank is thousands of rows — exact search is faster than any ANN
here).
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..ingest.corpus import normalize_rows
from ..ops.topk import dense_topk


class QAVectorStore:
    def __init__(self, embed_fn: Callable[[List[str]], np.ndarray],
                 persist_directory: Optional[str] = None) -> None:
        self.embed_fn = embed_fn
        self.persist_directory = persist_directory
        self.docs: List[Dict[str, Any]] = []
        self.metadatas: List[Dict[str, Any]] = []
        self.embeddings: Optional[np.ndarray] = None
        if persist_directory and os.path.exists(
            os.path.join(persist_directory, "qa_docs.jsonl")
        ):
            self._load()

    # ------------------------------------------------------------------
    def load_qa_data(self, qa_data: List[Dict[str, Any]],
                     batch_size: int = 100) -> None:
        """Batch-load QA entries (reference QARetriever.py:35-89 semantics:
        doc = JSON of question/question_rewritten/data; metadata carries
        doc_id and prev/next links)."""
        # stage into locals and commit only after embedding succeeds — an
        # embed_fn failure mid-call must not leave ghost docs that would
        # permanently misalign docs vs embeddings on retry
        texts = []
        new_docs = []
        new_mds = []
        start = len(self.docs)
        for offset, qa_item in enumerate(qa_data):
            idx = start + offset
            doc = {
                "question": qa_item["question"],
                "question_rewritten": qa_item["question_rewritten"],
                "data": qa_item["data"],
            }
            new_docs.append(doc)
            new_mds.append({
                "doc_id": f"qa_{idx}",
                "prev_chunk_id": f"qa_{idx - 1}" if idx > 0 else "",
                "next_chunk_id": "",  # patched below once total is known
                "question": qa_item["question"],
                "question_rewritten": qa_item["question_rewritten"],
            })
            texts.append(json.dumps(doc, ensure_ascii=False))

        new_emb = []
        for i in range(0, len(texts), batch_size):
            new_emb.append(np.asarray(self.embed_fn(texts[i:i + batch_size])))

        self.docs.extend(new_docs)
        self.metadatas.extend(new_mds)
        total = len(self.docs)
        for i, md in enumerate(self.metadatas):
            md["next_chunk_id"] = f"qa_{i + 1}" if i < total - 1 else ""
        if new_emb:
            emb = normalize_rows(np.concatenate(new_emb, axis=0))
            self.embeddings = (
                emb if self.embeddings is None
                else np.concatenate([self.embeddings, emb], axis=0)
            )
        if self.persist_directory:
            self.save()

    # ------------------------------------------------------------------
    def query_qa(self, query: str, n_results: int = 5) -> List[Dict[str, Any]]:
        """Top-n parsed QA entries by cosine similarity
        (reference QARetriever.py:91-107)."""
        if not self.docs:
            return []
        q = normalize_rows(np.asarray(self.embed_fn([query]), np.float32))
        k = min(n_results, len(self.docs))
        _, idx = dense_topk(jnp.asarray(self.embeddings), jnp.asarray(q), k)
        out = []
        for i in np.asarray(idx)[0]:
            doc = dict(self.docs[int(i)])
            doc["metadata"] = self.metadatas[int(i)]
            out.append(doc)
        return out

    # ------------------------------------------------------------------
    def save(self) -> None:
        os.makedirs(self.persist_directory, exist_ok=True)
        with open(os.path.join(self.persist_directory, "qa_docs.jsonl"), "w",
                  encoding="utf-8") as f:
            for doc, md in zip(self.docs, self.metadatas):
                f.write(json.dumps({"doc": doc, "metadata": md},
                                   ensure_ascii=False) + "\n")
        if self.embeddings is not None:
            np.save(os.path.join(self.persist_directory, "qa_embeddings.npy"),
                    self.embeddings)

    def _load(self) -> None:
        with open(os.path.join(self.persist_directory, "qa_docs.jsonl"),
                  encoding="utf-8") as f:
            for line in f:
                row = json.loads(line)
                self.docs.append(row["doc"])
                self.metadatas.append(row["metadata"])
        emb_path = os.path.join(self.persist_directory, "qa_embeddings.npy")
        if os.path.exists(emb_path):
            self.embeddings = np.load(emb_path)
        if self.docs and (self.embeddings is None
                          or len(self.embeddings) != len(self.docs)):
            raise ValueError(
                f"{self.persist_directory}: {len(self.docs)} docs but "
                f"{0 if self.embeddings is None else len(self.embeddings)} "
                "embeddings — the store is corrupt (qa_embeddings.npy "
                "missing or stale); rebuild with load_qa_data")

    def reset(self) -> None:
        self.docs, self.metadatas, self.embeddings = [], [], None
