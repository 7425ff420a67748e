"""Literal simulation of the reference EnsembleRetriever fusion semantics
(src/utils/ensembleRetriever.py:51-233), written the naive way — full numpy
search at fixed depth, O(N) metadata scans, dict-based score table — to
serve as a behavioral oracle for the TPU engine's fused implementation.
"""

import numpy as np


def oracle_ensemble_invoke(
    corpus_emb,            # [N, D] normalized
    ts_emb,                # [T, D] normalized or None
    metadata,              # list of reference-shaped metadata dicts
    texts,                 # list of chunk texts
    title_texts,           # title index -> title string
    bm25_scores_fn,        # query -> dense [N] scores
    embed_fn,              # list[str] -> [n, D]
    input_text,
    hyde_chunks,
    faiss_k=10,
    bm25_k=10,
    faiss_ts_k=10,
    enable_expand=False,
    depth=2048,
    dense_results=None,
    ts_result=None,
):
    """``dense_results`` (per-query (ids, scores) at full depth) and
    ``ts_result`` may be injected so the oracle ranks with the exact same
    arithmetic as the implementation under test — isolating fusion semantics
    from matmul summation-order ulps, which legitimately reorder exact ties
    across batch shapes/backends (SURVEY.md §7.3 tolerance policy).
    Defaults to numpy fp32 search."""
    n = len(texts)
    docid2idx = {md["doc_id"]: i for i, md in enumerate(metadata)}
    seen_ids = set()
    chunk_list = []
    bundle_cnt = 0

    def full_search(qi, q):
        if dense_results is not None:
            return dense_results[qi]
        scores = (q @ corpus_emb.T).astype(np.float32)
        order = np.argsort(-scores, kind="stable")[:depth]
        return order, scores[order]

    def norm(v):
        v = np.asarray(v, np.float32)
        return v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-12)

    def emit(ids, retriever, score):
        nonlocal bundle_cnt
        for i in ids:
            chunk_list.append(
                {
                    "retriever": retriever,
                    "score": float(score),
                    "page_content": texts[i],
                    "metadata": metadata[i],
                    "bundle_id": bundle_cnt,
                }
            )
        bundle_cnt += 1

    def gather_bundle(idx):
        md = metadata[idx]
        if md.get("bundle_id", None) is not None:
            bundle_ids = [
                j for j, m in enumerate(metadata)
                if m.get("bundle_id", None) == md["bundle_id"]
            ]
            seen_ids.update(bundle_ids)
            return bundle_ids
        return [idx]

    # ---- FAISS path ----------------------------------------------------
    if faiss_k > 0:
        inputs = [input_text] + list(hyde_chunks)
        q_embs = norm(embed_fn(inputs))
        for qi, q in enumerate(q_embs):
            faiss_ids, faiss_scores = full_search(qi, q)
            effective_ids = {int(i): float(s) for i, s in zip(faiss_ids, faiss_scores)}
            for idx, score in zip(faiss_ids[:faiss_k], faiss_scores[:faiss_k]):
                idx = int(idx)
                if idx in seen_ids:
                    continue
                seen_ids.add(idx)
                ids = gather_bundle(idx)

                if score > 0.72 and enable_expand:
                    md = metadata[idx]
                    prev_doc_id = md["prev_chunk_id"]
                    next_doc_id = md["next_chunk_id"]
                    while len(ids) < 4:
                        flag = False
                        if prev_doc_id != "" and docid2idx.get(prev_doc_id, -1) != -1:
                            prev_id = docid2idx[prev_doc_id]
                            if effective_ids.get(prev_id, 0) > 0.66 and prev_id not in seen_ids:
                                flag = True
                                seen_ids.add(prev_id)
                                ids.insert(0, prev_id)
                                prev_doc_id = metadata[prev_id]["prev_chunk_id"]
                        if next_doc_id != "" and docid2idx.get(next_doc_id, -1) != -1:
                            next_id = docid2idx[next_doc_id]
                            if effective_ids.get(next_id, 0) > 0.66 and next_id not in seen_ids:
                                flag = True
                                seen_ids.add(next_id)
                                ids.append(next_id)
                                next_doc_id = metadata[next_id]["next_chunk_id"]
                        if not flag:
                            break

                emit(ids, "FAISS", score)

    # ---- Title-summary path --------------------------------------------
    if faiss_ts_k > 0 and ts_emb is not None and len(ts_emb):
        if ts_result is not None:
            order, ts_scores = ts_result
        else:
            q = norm(embed_fn([input_text]))[0]
            full = (q @ ts_emb.T).astype(np.float32)
            order = np.argsort(-full, kind="stable")
            ts_scores = full[order]
        order = order[: min(faiss_ts_k, len(ts_emb))]
        scores_by_title = {int(t): float(s) for t, s in zip(order, ts_scores)}
        for t_idx in order:
            title = title_texts[int(t_idx)]
            chunk_idxs = [
                j for j, m in enumerate(metadata)
                if m.get("title_summary", "") == title
            ]
            for idx in chunk_idxs:
                if idx in seen_ids:
                    continue
                seen_ids.add(idx)
                ids = gather_bundle(idx)
                emit(ids, "Title Summary", scores_by_title[int(t_idx)])

    # ---- BM25 path -------------------------------------------------------
    if bm25_k > 0:
        scores = bm25_scores_fn(input_text)
        order = np.lexsort((np.arange(n), -scores))
        for idx in order[:bm25_k]:
            idx = int(idx)
            if idx in seen_ids:
                continue
            seen_ids.add(idx)
            ids = gather_bundle(idx)
            emit(ids, "BM25", scores[idx])

    return chunk_list
