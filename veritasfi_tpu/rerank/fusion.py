"""Rerank score fusion and context selection.

Behavioral parity targets:
  * ``rank_chunk`` — reference src/utils/vllmManager.py:430-483: combined
    score = cross-encoder score + time score (max(0, 1-|Δdays|/365)), sort
    descending, then greedy bundle-capped selection skipping (a) bundles
    already selected, (b) bundles that would push the total chunk count over
    ``chunk_topk`` (default 5), (c) chunks whose similarity to an
    already-"selected index" exceeds 0.9; returns selected bundle ids
    REVERSED (vllmManager.py:483).

    NOTE (preserved quirk): the reference checks similarity with
    ``similar_mtx[idx, selected_indices]`` where ``selected_indices`` holds
    *bundle ids*, i.e. it indexes the chunk-level similarity matrix with
    bundle ids (vllmManager.py:476-480). When every bundle has one chunk the
    two coincide; with multi-chunk bundles this is the reference's actual
    behavior and is reproduced bit-for-bit.

  * ``select_content`` — reference src/utils/vllmChatService.py:32-70:
    bundles whose concatenated text is shorter than 50 chars are dropped,
    survivors are flattened, sorted by global_id (document order), and
    formatted as "Date Published: {d}; Chunk Content: {c}" lines.

These are pure host functions over <= ~60 candidates; the heavy inputs
(cross-encoder scores, similarity matrix) come from batched device kernels,
and the similarity matrix reuses retrieval embeddings instead of re-embedding
every chunk (the reference re-embeds on GPU per query,
ensembleRetriever.py:275).
"""

from __future__ import annotations

from datetime import datetime
from typing import Dict, List, Sequence, Tuple

import numpy as np

_EPOCH = datetime(1970, 1, 1)


def _to_days(value) -> float:
    if isinstance(value, (int, float)):
        return float(value)
    if isinstance(value, datetime):
        return (value - _EPOCH).days
    return (datetime.strptime(str(value), "%Y-%m-%d") - _EPOCH).days


def chunk_time_scores(chunks: Sequence[Dict], query_time) -> np.ndarray:
    """time score = max(0, 1 - |query_time - date_published| / 365)
    (vllmManager.py:443-447)."""
    q_days = _to_days(query_time)
    out = np.zeros(len(chunks), np.float32)
    for i, chunk in enumerate(chunks):
        # tolerate missing/unparseable dates like select_content does
        # ('N/A' fallback) — score 0 instead of killing the whole query
        try:
            d_days = _to_days(chunk["metadata"]["date_published"])
        except (KeyError, ValueError, TypeError):
            continue
        out[i] = max(0.0, 1.0 - abs(q_days - d_days) / 365.0)
    return out


def rank_chunk(
    chunks: Sequence[Dict],
    reranker_scores: Sequence[float],
    time_scores: Sequence[float],
    similar_mtx: np.ndarray,
    chunk_topk: int = 5,
    similar_threshold: float = 0.9,
) -> List[int]:
    """Greedy bundle-capped selection; returns bundle ids reversed."""
    bundle_map: Dict[int, List[int]] = {}
    for idx, chunk in enumerate(chunks):
        bundle_map.setdefault(chunk["bundle_id"], []).append(idx)

    scores = np.asarray(reranker_scores, np.float32) + np.asarray(
        time_scores, np.float32
    )
    ranked_indices = np.argsort(-scores, kind="stable")
    sim = np.asarray(similar_mtx)   # once — not per ranked candidate

    selected_indices: List[int] = []
    current_size = 0
    for idx in ranked_indices:
        bundle_id = chunks[idx]["bundle_id"]
        bundle = bundle_map[bundle_id]
        if bundle_id in selected_indices or current_size + len(bundle) > chunk_topk:
            continue
        # The quirk above indexes the CHUNK-level matrix with BUNDLE ids.
        # Without M3 reordering a capped list can only hold bundle ids
        # below its own length (each bundle emits at least one chunk
        # before any later bundle), so the reference never sees an
        # out-of-range id. An M3 reorder (beyond-reference) can promote a
        # late bundle into the cap; such ids have no column here, so they
        # sit out the similarity veto instead of crashing the lookup —
        # FusedServePath._rank_chunk_device applies the same rule.
        in_range = [b for b in selected_indices if b < sim.shape[1]]
        if in_range and np.any(sim[idx, in_range] > similar_threshold):
            continue
        selected_indices.append(bundle_id)
        current_size += len(bundle)

    return selected_indices[::-1]


def select_content(
    chunks: Sequence[Dict],
    top_bundle_ids: Sequence[int],
    min_bundle_chars: int = 50,
) -> Tuple[str, List[str], List[Dict]]:
    """Returns (rag_content, time_info_list, selected_chunks)
    (vllmChatService.py:32-70)."""
    selected_chunks: List[Dict] = []
    for bundle_id in top_bundle_ids:
        bundle_chunks = [c for c in chunks if c["bundle_id"] == bundle_id]
        page_content = " ".join(c["page_content"] for c in bundle_chunks)
        if len(page_content) < min_bundle_chars:
            continue
        selected_chunks.extend(bundle_chunks)

    selected_chunks = sorted(
        selected_chunks, key=lambda c: c["metadata"]["global_id"]
    )
    rag_content = "\n".join(
        f"Date Published: {c['metadata'].get('date_published', 'N/A')}; "
        f"Chunk Content: {c['page_content']}"
        for c in selected_chunks
    )
    time_info_list = [
        c["metadata"].get("date_published", "N/A") for c in selected_chunks
    ]
    return rag_content, time_info_list, selected_chunks
