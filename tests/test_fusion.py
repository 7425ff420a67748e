from datetime import datetime

import numpy as np

from veritasfi_tpu.rerank.fusion import chunk_time_scores, rank_chunk, select_content


def mk_chunk(content, bundle_id, date="2024-01-01", gid=0):
    return {
        "retriever": "FAISS",
        "score": 0.5,
        "page_content": content,
        "metadata": {"date_published": date, "global_id": gid, "doc_id": f"d{gid}"},
        "bundle_id": bundle_id,
    }


def test_time_scores():
    chunks = [mk_chunk("a", 0, date="2024-01-01"),
              mk_chunk("b", 1, date="2023-01-01"),
              mk_chunk("c", 2, date="2020-01-01")]
    ts = chunk_time_scores(chunks, datetime(2024, 1, 1))
    assert ts[0] == 1.0
    np.testing.assert_allclose(ts[1], 1 - 365 / 365, atol=1e-6)
    assert ts[2] == 0.0  # clamped at 0


def test_rank_chunk_orders_and_reverses():
    chunks = [mk_chunk(f"c{i}", i, gid=i) for i in range(4)]
    rr = [0.1, 0.9, 0.5, 0.3]
    tt = [0.0] * 4
    sim = np.eye(4, dtype=np.float32)
    sel = rank_chunk(chunks, rr, tt, sim, chunk_topk=5)
    # ranked order: 1, 2, 3, 0 -> selected [1,2,3,0] -> reversed
    assert sel == [0, 3, 2, 1]


def test_rank_chunk_topk_cap():
    # bundle 0 has 3 chunks, bundle 1 has 3 chunks, topk 5 -> only one fits
    chunks = ([mk_chunk(f"a{i}", 0, gid=i) for i in range(3)]
              + [mk_chunk(f"b{i}", 1, gid=3 + i) for i in range(3)])
    rr = [1.0] * 3 + [0.5] * 3
    sim = np.zeros((6, 6), np.float32)
    sel = rank_chunk(chunks, rr, [0.0] * 6, sim, chunk_topk=5)
    assert sel == [0]


def test_rank_chunk_similarity_dedup():
    chunks = [mk_chunk("a", 0, gid=0), mk_chunk("b", 1, gid=1),
              mk_chunk("c", 2, gid=2)]
    rr = [0.9, 0.8, 0.7]
    sim = np.eye(3, dtype=np.float32)
    sim[1, 0] = sim[0, 1] = 0.95  # chunk1 ~ chunk0 -> skipped
    sel = rank_chunk(chunks, rr, [0.0] * 3, sim, chunk_topk=5)
    assert sel == [2, 0]


def test_rank_chunk_bundleid_quirk():
    """selected_indices holds bundle ids and indexes the chunk-level sim
    matrix (reference quirk, vllmManager.py:476-480)."""
    # chunks 0,1 in bundle 7; chunk 2 in bundle 0
    chunks = [mk_chunk("a", 7, gid=0), mk_chunk("b", 7, gid=1),
              mk_chunk("c", 0, gid=2)]
    rr = [0.9, 0.8, 0.7]
    sim = np.eye(3, dtype=np.float32)
    # after selecting bundle 7, the sim check for chunk 2 looks at
    # sim[2, [7]] -- out of the 3x3 matrix in the reference this would index
    # row 7; our chunks list is small so clamp scenario: use 8x8 matrix as
    # the engine would (bundle ids < #chunks in practice)
    sim = np.zeros((8, 8), np.float32)
    sel = rank_chunk(chunks, rr, [0.0] * 3, sim, chunk_topk=5)
    assert sel == [0, 7]


def test_select_content_formats_and_filters():
    chunks = [
        mk_chunk("x" * 60, 0, date="2024-02-01", gid=5),
        mk_chunk("tiny", 1, date="2024-03-01", gid=1),       # <50 chars -> dropped
        mk_chunk("y" * 60, 2, date="2024-01-01", gid=2),
    ]
    content, times, selected = select_content(chunks, [0, 1, 2])
    # sorted by global_id: gid2 before gid5
    assert [c["metadata"]["global_id"] for c in selected] == [2, 5]
    assert times == ["2024-01-01", "2024-02-01"]
    lines = content.split("\n")
    assert lines[0].startswith("Date Published: 2024-01-01; Chunk Content: y")
    assert len(lines) == 2


def test_select_content_bundle_concat_length():
    # two chunks of 30 chars in one bundle -> joined > 50 -> kept
    chunks = [mk_chunk("a" * 30, 0, gid=0), mk_chunk("b" * 30, 0, gid=1)]
    content, _, selected = select_content(chunks, [0])
    assert len(selected) == 2
