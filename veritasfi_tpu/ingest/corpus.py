"""CorpusIndex — the corpus as arrays, not a document database.

The reference stores chunks in ChromaDB and rebuilds an in-memory FAISS
index at startup (reference: src/utils/ragManager.py:70-83,
faissRetriever.py:18-24), then does O(N) Python scans over metadata for
bundle gathering and title->chunk mapping (ensembleRetriever.py:81,145,157).

Here one ``CorpusIndex`` per collection holds:

* ``embeddings [N, D]`` — L2-normalized, device-resident (HBM), shardable
  over a 'corpus' mesh axis;
* int32 metadata arrays ``global_id, date_days, prev_idx, next_idx,
  bundle_code, title_code`` enabling O(1)/vectorized bundle + neighbor logic;
* CSR inverted maps ``bundle -> chunk rows`` and ``title -> chunk rows``
  precomputed at ingest (killing the reference's O(N) scans);
* host-side text store + reference-shaped metadata reconstruction for exact
  output parity;
* title-summary embedding matrix ``ts_embeddings [T, D]`` (the reference's
  second dense path, ensembleRetriever.py:42-43).

Persistence is a directory of .npz + JSON (the index *is* the checkpoint,
as in the reference where Chroma/BM25 dirs are the checkpoints,
ragManager.py:70-83, bm25Retriever.py:18).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from datetime import datetime
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from .contract import ChunkRecord

_EPOCH = datetime(1970, 1, 1)


def date_to_days(date_str: str) -> int:
    """Days since epoch for a YYYY-MM-DD string (rank_chunk's time score
    works on day deltas, vllmManager.py:445-446)."""
    return (datetime.strptime(date_str, "%Y-%m-%d") - _EPOCH).days


def _csr_from_codes(codes: np.ndarray, num_groups: int) -> Tuple[np.ndarray, np.ndarray]:
    """CSR (indptr, members) mapping group code -> ascending row indices."""
    rows = np.nonzero(codes >= 0)[0]
    order = np.argsort(codes[rows], kind="stable")
    members = rows[order].astype(np.int32)
    counts = np.bincount(codes[rows], minlength=num_groups)
    indptr = np.zeros(num_groups + 1, dtype=np.int32)
    np.cumsum(counts, out=indptr[1:])
    return indptr, members


@dataclass
class CorpusIndex:
    # host text/metadata
    texts: List[str]
    doc_ids: List[str]
    filenames: List[str]
    page_numbers: List[int]
    dates: List[str]
    bundle_names: List[str]        # bundle code -> original bundle_id string
    title_texts: List[str]         # title code -> title_summary text
    modalities: List[str]

    # int arrays [N]
    global_id: np.ndarray
    date_days: np.ndarray
    prev_idx: np.ndarray           # -1 if none
    next_idx: np.ndarray
    bundle_code: np.ndarray        # -1 if none
    title_code: np.ndarray         # -1 if none

    # CSR inverted maps
    bundle_indptr: np.ndarray
    bundle_members: np.ndarray
    title_indptr: np.ndarray
    title_members: np.ndarray

    # dense matrices (L2-normalized float32; moved to device by the engine)
    embeddings: Optional[np.ndarray] = None      # [N, D]
    ts_embeddings: Optional[np.ndarray] = None   # [T, D]

    # ------------------------------------------------------------------
    @property
    def num_chunks(self) -> int:
        return len(self.texts)

    @property
    def dim(self) -> int:
        return 0 if self.embeddings is None else self.embeddings.shape[1]

    def doc_index(self) -> Dict[str, int]:
        """doc_id -> row index (reference: ensembleRetriever.py:46)."""
        if not hasattr(self, "_doc_index"):
            self._doc_index = {d: i for i, d in enumerate(self.doc_ids)}
        return self._doc_index

    def metadata(self, i: int) -> Dict:
        """Reference-shaped metadata dict for chunk row ``i``
        (schema: load_data.py:66-77,107-118)."""
        md = {
            "filename": self.filenames[i],
            "page_number": self.page_numbers[i],
            "date_published": self.dates[i],
            "doc_id": self.doc_ids[i],
            "global_id": int(self.global_id[i]),
        }
        b = int(self.bundle_code[i])
        if b >= 0:
            md["bundle_id"] = self.bundle_names[b]
        t = int(self.title_code[i])
        if t >= 0:
            md["title_summary"] = self.title_texts[t]
        p, n = int(self.prev_idx[i]), int(self.next_idx[i])
        md["prev_chunk_id"] = self.doc_ids[p] if p >= 0 else ""
        md["next_chunk_id"] = self.doc_ids[n] if n >= 0 else ""
        return md

    def bundle_rows(self, code: int) -> np.ndarray:
        """Ascending row indices of a bundle (replaces the reference's O(N)
        scan at ensembleRetriever.py:81)."""
        return self.bundle_members[self.bundle_indptr[code]:self.bundle_indptr[code + 1]]

    def title_rows(self, code: int) -> np.ndarray:
        """Ascending row indices sharing a title summary
        (replaces ensembleRetriever.py:145)."""
        return self.title_members[self.title_indptr[code]:self.title_indptr[code + 1]]

    # ------------------------------------------------------------------
    def save(self, dir_path: str) -> None:
        os.makedirs(dir_path, exist_ok=True)
        np.savez_compressed(
            os.path.join(dir_path, "arrays.npz"),
            global_id=self.global_id,
            date_days=self.date_days,
            prev_idx=self.prev_idx,
            next_idx=self.next_idx,
            bundle_code=self.bundle_code,
            title_code=self.title_code,
            bundle_indptr=self.bundle_indptr,
            bundle_members=self.bundle_members,
            title_indptr=self.title_indptr,
            title_members=self.title_members,
        )
        if self.embeddings is not None:
            np.save(os.path.join(dir_path, "embeddings.npy"), self.embeddings)
        if self.ts_embeddings is not None:
            np.save(os.path.join(dir_path, "ts_embeddings.npy"), self.ts_embeddings)
        meta = {
            "doc_ids": self.doc_ids,
            "filenames": self.filenames,
            "page_numbers": self.page_numbers,
            "dates": self.dates,
            "bundle_names": self.bundle_names,
            "title_texts": self.title_texts,
            "modalities": self.modalities,
        }
        with open(os.path.join(dir_path, "meta.json"), "w", encoding="utf-8") as f:
            json.dump(meta, f, ensure_ascii=False)
        with open(os.path.join(dir_path, "texts.jsonl"), "w", encoding="utf-8") as f:
            for t in self.texts:
                f.write(json.dumps(t, ensure_ascii=False) + "\n")

    @classmethod
    def load(cls, dir_path: str) -> "CorpusIndex":
        arrays = np.load(os.path.join(dir_path, "arrays.npz"))
        with open(os.path.join(dir_path, "meta.json"), encoding="utf-8") as f:
            meta = json.load(f)
        texts = []
        with open(os.path.join(dir_path, "texts.jsonl"), encoding="utf-8") as f:
            for line in f:
                texts.append(json.loads(line))
        emb_path = os.path.join(dir_path, "embeddings.npy")
        ts_path = os.path.join(dir_path, "ts_embeddings.npy")
        return cls(
            texts=texts,
            doc_ids=meta["doc_ids"],
            filenames=meta["filenames"],
            page_numbers=meta["page_numbers"],
            dates=meta["dates"],
            bundle_names=meta["bundle_names"],
            title_texts=meta["title_texts"],
            modalities=meta.get("modalities", ["text"] * len(texts)),
            global_id=arrays["global_id"],
            date_days=arrays["date_days"],
            prev_idx=arrays["prev_idx"],
            next_idx=arrays["next_idx"],
            bundle_code=arrays["bundle_code"],
            title_code=arrays["title_code"],
            bundle_indptr=arrays["bundle_indptr"],
            bundle_members=arrays["bundle_members"],
            title_indptr=arrays["title_indptr"],
            title_members=arrays["title_members"],
            embeddings=np.load(emb_path) if os.path.exists(emb_path) else None,
            ts_embeddings=np.load(ts_path) if os.path.exists(ts_path) else None,
        )


def normalize_rows(x: np.ndarray) -> np.ndarray:
    """L2-normalize rows (cosine == inner product after this;
    reference: faissRetriever.py:21-23 normalize_L2)."""
    x = np.asarray(x, dtype=np.float32)
    norms = np.linalg.norm(x, axis=-1, keepdims=True)
    return x / np.maximum(norms, 1e-12)


def build_corpus_index(
    records: Sequence[ChunkRecord],
    title_summaries: Sequence[str],
    embed_fn: Optional[Callable[[List[str]], np.ndarray]] = None,
    batch_size: int = 256,
    image_embed_fn: Optional[Callable[[List[str]], np.ndarray]] = None,
) -> CorpusIndex:
    """Build a CorpusIndex from deduped/linked records.

    ``embed_fn`` maps a list of texts to an [n, D] array; it is called in
    batches for both chunk contents and title summaries (the reference
    embeds both into separate Chroma collections, load_data.py:98-128).

    ``image_embed_fn`` (optional) embeds figure chunks carrying an
    ``image_path`` into the SAME joint space (must produce the same D), so
    the unified matrix supports mixed-modality top-k (BASELINE config #4).
    """
    n = len(records)
    doc_ids = [r.doc_id for r in records]
    doc2row = {d: i for i, d in enumerate(doc_ids)}

    bundle_names: List[str] = []
    bundle_lookup: Dict[str, int] = {}
    bundle_code = np.full(n, -1, dtype=np.int32)
    # first-wins lookup: a duplicate title string would otherwise map
    # carriers to the LAST index while the tie-broken title search returns
    # the FIRST (lower index) — title_rows(first) would come back empty and
    # the title path silently retrieve nothing (contract.load_processed_dir
    # dedups, but this is public API taking any Sequence[str])
    title_lookup: Dict[str, int] = {}
    for i, t in enumerate(title_summaries):
        title_lookup.setdefault(t, i)
    title_code = np.full(n, -1, dtype=np.int32)
    prev_idx = np.full(n, -1, dtype=np.int32)
    next_idx = np.full(n, -1, dtype=np.int32)
    global_id = np.zeros(n, dtype=np.int32)
    date_days = np.zeros(n, dtype=np.int32)

    for i, r in enumerate(records):
        global_id[i] = r.global_id
        date_days[i] = date_to_days(r.date_published)
        if r.bundle_id is not None:
            code = bundle_lookup.get(r.bundle_id)
            if code is None:
                code = bundle_lookup[r.bundle_id] = len(bundle_names)
                bundle_names.append(r.bundle_id)
            bundle_code[i] = code
        if r.title_summary is not None:
            title_code[i] = title_lookup[r.title_summary]
        if r.prev_chunk_id:
            prev_idx[i] = doc2row.get(r.prev_chunk_id, -1)
        if r.next_chunk_id:
            next_idx[i] = doc2row.get(r.next_chunk_id, -1)

    bundle_indptr, bundle_members = _csr_from_codes(bundle_code, len(bundle_names))
    title_indptr, title_members = _csr_from_codes(title_code, len(title_summaries))

    embeddings = ts_embeddings = None
    if embed_fn is not None:
        embeddings = _batched_embed(embed_fn, [r.content for r in records], batch_size)
        if image_embed_fn is not None and embeddings is not None:
            image_rows = [i for i, r in enumerate(records)
                          if r.image_path is not None]
            if image_rows:
                img_emb = normalize_rows(np.asarray(image_embed_fn(
                    [records[i].image_path for i in image_rows])))
                if img_emb.shape[1] != embeddings.shape[1]:
                    raise ValueError(
                        f"image embedding dim {img_emb.shape[1]} != text "
                        f"dim {embeddings.shape[1]}; use a projection head "
                        f"onto the joint space")
                embeddings[np.asarray(image_rows)] = img_emb
        if title_summaries:
            ts_embeddings = _batched_embed(embed_fn, list(title_summaries), batch_size)

    return CorpusIndex(
        texts=[r.content for r in records],
        doc_ids=doc_ids,
        filenames=[r.filename for r in records],
        page_numbers=[r.page_number for r in records],
        dates=[r.date_published for r in records],
        bundle_names=bundle_names,
        title_texts=list(title_summaries),
        modalities=[r.modality for r in records],
        global_id=global_id,
        date_days=date_days,
        prev_idx=prev_idx,
        next_idx=next_idx,
        bundle_code=bundle_code,
        title_code=title_code,
        bundle_indptr=bundle_indptr,
        bundle_members=bundle_members,
        title_indptr=title_indptr,
        title_members=title_members,
        embeddings=embeddings,
        ts_embeddings=ts_embeddings,
    )


def _batched_embed(embed_fn, texts: List[str], batch_size: int) -> np.ndarray:
    outs = []
    for i in range(0, len(texts), batch_size):
        outs.append(np.asarray(embed_fn(texts[i:i + batch_size])))
    return normalize_rows(np.concatenate(outs, axis=0)) if outs else None
