"""Processed-PDF JSON ingestion contract.

The reference's multi-modal PDF preprocessor is not in its repo; ingestion
consumes already-processed JSON files where row 0 is a header
``{"start", "end", "date_published"}`` and each following row is a chunk
``{"content", "page_number", "bundle_id"?, "title_summary"?}``
(reference: src/load_data.py:48-78). This module defines that contract as
the framework's ingestion input and reproduces the reference's exact data
semantics:

* page-range filter with ``ignore_range`` override (load_data.py:65)
* ``global_id`` assigned per in-range chunk, pre-dedup (load_data.py:71-73)
* SHA-256 content dedup keeping the newest ``date_published``
  (load_data.py:80-89); replacement swaps content+metadata in place, so the
  deduped ordering is first-occurrence order
* ``prev_chunk_id`` / ``next_chunk_id`` linking between adjacent deduped
  chunks of the same file (load_data.py:107-118)
* title-summary set collected across all in-range chunks (load_data.py:78)
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple


def hash_content(content: str) -> str:
    """SHA-256 doc id (reference: load_data.py:39-41)."""
    return hashlib.sha256(content.encode("utf-8")).hexdigest()


@dataclass
class ChunkRecord:
    """One deduped corpus chunk with reference-shaped metadata."""

    content: str
    filename: str
    page_number: int
    date_published: str          # "YYYY-MM-DD"
    doc_id: str
    global_id: int
    bundle_id: Optional[str] = None
    title_summary: Optional[str] = None
    prev_chunk_id: str = ""
    next_chunk_id: str = ""
    # Multi-modal extension (not present in the reference's chunk rows, which
    # carry tables/figures as bundled text): modality tag + optional image
    # reference for figure chunks embedded by the vision encoder into the
    # unified corpus matrix (BASELINE config #4).
    modality: str = "text"
    image_path: Optional[str] = None

    def metadata(self) -> Dict:
        """Reference-shaped metadata dict (load_data.py:66-77,107-118)."""
        md = {
            "filename": self.filename,
            "page_number": self.page_number,
            "date_published": self.date_published,
            "doc_id": self.doc_id,
            "global_id": self.global_id,
        }
        if self.bundle_id:
            md["bundle_id"] = self.bundle_id
        if self.title_summary:
            md["title_summary"] = self.title_summary
        md["prev_chunk_id"] = self.prev_chunk_id
        md["next_chunk_id"] = self.next_chunk_id
        return md


def parse_processed_json(path: str) -> Tuple[Dict, List[Dict]]:
    """Parse one processed-PDF JSON file into (header, chunk rows)."""
    with open(path, encoding="utf-8") as f:
        rows = json.load(f)
    if not isinstance(rows, list) or not rows:
        raise ValueError(f"{path}: expected a non-empty JSON array")
    header = rows[0]
    for key in ("start", "end", "date_published"):
        if key not in header:
            raise ValueError(f"{path}: header row missing '{key}'")
    return header, rows[1:]


def load_processed_dir(
    dir_path: str,
    ignore_range: bool = False,
    filenames: Optional[List[str]] = None,
) -> Tuple[List[ChunkRecord], List[str]]:
    """Load a directory of processed JSON files into deduped, linked records.

    Returns (records, title_summaries). ``title_summaries`` is the sorted
    unique set (the reference materializes ``list(set)``, load_data.py:97,
    whose order is unspecified; we sort for determinism).
    """
    if filenames is None:
        # Sorted for determinism (the reference's os.listdir order,
        # load_data.py:43, is filesystem-dependent; file order decides
        # global_id assignment and prev/next linking).
        filenames = sorted(os.listdir(dir_path))

    content_dict: Dict[str, ChunkRecord] = {}
    gid = 0
    title_summaries = set()

    for filename in filenames:
        if not filename.endswith(".json"):
            continue
        header, rows = parse_processed_json(os.path.join(dir_path, filename))
        page_start = int(header["start"])
        page_end = int(header["end"])
        date_published = header["date_published"]

        for row in rows:
            content = row.get("content", "")
            page_number = row.get("page_number")
            bundle_id = row.get("bundle_id", None)
            title_summary = row.get("title_summary", None)
            modality = row.get("modality", "text")
            image_path = row.get("image_path", None)

            try:
                page_number = int(page_number) if page_number is not None                     else page_start
            except (TypeError, ValueError):
                raise ValueError(
                    f"{filename}: chunk row has invalid page_number "
                    f"{page_number!r}")
            if not (ignore_range or page_start <= page_number <= page_end):
                continue

            # figure rows may share placeholder content text — the dedup
            # key must include the image reference or one image silently
            # vanishes from the multimodal index
            doc_id = hash_content(
                content if not image_path
                else f"{content}\x00{image_path}")
            rec = ChunkRecord(
                content=content,
                filename=filename,
                page_number=page_number,
                date_published=date_published,
                doc_id=doc_id,
                global_id=gid,
                bundle_id=bundle_id or None,
                title_summary=title_summary or None,
                modality=modality,
                image_path=image_path,
            )
            gid += 1
            if title_summary:
                title_summaries.add(title_summary)

            existing = content_dict.get(doc_id)
            if existing is None:
                content_dict[doc_id] = rec
            elif date_published > existing.date_published:
                # Keep-newest replacement preserves first-occurrence position
                # (dict key already exists), like load_data.py:81-86.
                content_dict[doc_id] = rec

    records = list(content_dict.values())

    # prev/next linking between adjacent deduped chunks of the same file
    # (load_data.py:107-118).
    for i, rec in enumerate(records):
        if i > 0 and records[i - 1].filename == rec.filename:
            rec.prev_chunk_id = records[i - 1].doc_id
        if i + 1 < len(records) and records[i + 1].filename == rec.filename:
            rec.next_chunk_id = records[i + 1].doc_id

    return records, sorted(title_summaries)
