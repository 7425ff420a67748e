"""Micro-batched multi-request retrieval must equal sequential invokes."""

import pytest

from test_ensemble import EMB, make_corpus, strip_rows
from veritasfi_tpu.retrieval.ensemble import EnsembleRetriever


@pytest.mark.parametrize("expand", [False, True])
def test_invoke_batch_matches_sequential(tmp_path, expand):
    idx, bm25 = make_corpus(tmp_path, seed=51)
    eng = EnsembleRetriever(idx, EMB.encode, bm25=bm25, k=6,
                            enable_expand=expand)
    reqs = [("zeekr revenue margin", ["hypothetical one"]),
            ("stores europe", []),
            ("w1 w2 w3", ["h a", "h b"])]
    batched = eng.invoke_batch(reqs)
    seq = [eng.invoke(q, h) for q, h in reqs]
    for a, b in zip(batched, seq):
        assert strip_rows(a) == strip_rows(b)


def test_invoke_batch_empty():
    from veritasfi_tpu.ingest.corpus import build_corpus_index

    idx = build_corpus_index([], [], embed_fn=None)
    eng = EnsembleRetriever(idx, EMB.encode, k=3)
    assert eng.invoke_batch([]) == []


def test_invoke_batch_with_fused_encoder(tmp_path):
    from veritasfi_tpu.models.encoder import TextEncoder
    from veritasfi_tpu.ingest.corpus import normalize_rows

    idx, bm25 = make_corpus(tmp_path, seed=52)
    enc = TextEncoder(preset="tiny-test")
    idx.embeddings = normalize_rows(enc.encode(idx.texts))
    idx.ts_embeddings = normalize_rows(enc.encode(idx.title_texts))
    eng = EnsembleRetriever(idx, enc.encode, bm25=bm25, k=4, encoder=enc)
    reqs = [("revenue growth", ["hypo"]), ("delivery europe", [])]
    batched = eng.invoke_batch(reqs)
    seq = [eng.invoke(q, h) for q, h in reqs]
    # batch padding changes encoder matmul shapes, so near-tie orderings may
    # legitimately flip at the ulp level; compare hit sets + scores by doc
    for a, b in zip(batched, seq):
        sa = {(c["retriever"], c["metadata"]["doc_id"]) for c in a}
        sb = {(c["retriever"], c["metadata"]["doc_id"]) for c in b}
        assert sa == sb
        score_a = {c["metadata"]["doc_id"]: c["score"] for c in a}
        score_b = {c["metadata"]["doc_id"]: c["score"] for c in b}
        for doc, s in score_a.items():
            assert abs(s - score_b[doc]) < 1e-3


def test_invoke_batch_bm25_only(tmp_path):
    """A BM25-only retriever (no embeddings) must fall back to sequential
    invoke instead of crashing in the fused dense search."""
    idx, bm25 = make_corpus(tmp_path, seed=5)
    idx.embeddings = None
    idx.ts_embeddings = None
    eng = EnsembleRetriever(idx, EMB.encode, bm25=bm25, k=4)
    reqs = [("zeekr revenue margin", []), ("stores europe", [])]
    batched = eng.invoke_batch(reqs)
    serial = [eng.invoke(q, h) for q, h in reqs]
    assert [strip_rows(r) for r in batched] == [strip_rows(r)
                                                for r in serial]
    assert any(batched[0]) and all(
        c["retriever"] == "BM25" for c in batched[0])


def test_title_only_corpus_invoke(tmp_path):
    """ts embeddings present, content embeddings absent: the title path
    must run (and the dense path stay off) without crashing."""
    idx, bm25 = make_corpus(tmp_path, seed=6, title_frac=1.0)
    idx.embeddings = None
    eng = EnsembleRetriever(idx, EMB.encode, bm25=None, k=4)
    chunks = eng.invoke("zeekr revenue margin", [])
    assert chunks and all(c["retriever"] == "Title Summary" for c in chunks)
    batched = eng.invoke_batch([("zeekr revenue margin", [])])
    assert [strip_rows(r) for r in batched] == [strip_rows(chunks)]


def test_dense_only_corpus_invoke(tmp_path):
    """content embeddings present, ts embeddings absent: the dense path
    runs and the title path is compiled out (run_ts=False) — no
    placeholder title operand in the fused program."""
    idx, bm25 = make_corpus(tmp_path, seed=8)
    idx.ts_embeddings = None
    eng = EnsembleRetriever(idx, EMB.encode, bm25=None, k=4,
                            enable_expand=True)
    chunks = eng.invoke("zeekr revenue margin", ["hypo"])
    assert chunks and all(c["retriever"] == "FAISS" for c in chunks)
    batched = eng.invoke_batch([("zeekr revenue margin", ["hypo"])])
    assert [strip_rows(r) for r in batched] == [strip_rows(chunks)]


def test_faiss_k_zero_compiles_out_dense(tmp_path):
    """faiss_k=0 with content embeddings present: the dense top-k is
    compiled out (run_dense=False), and results equal title+BM25 only."""
    idx, bm25 = make_corpus(tmp_path, seed=9)
    eng = EnsembleRetriever(idx, EMB.encode, bm25=bm25, k=4, faiss_k=0)
    chunks = eng.invoke("zeekr revenue margin", [])
    assert chunks and all(c["retriever"] in ("Title Summary", "BM25")
                          for c in chunks)
    batched = eng.invoke_batch([("zeekr revenue margin", [])])
    assert [strip_rows(r) for r in batched] == [strip_rows(chunks)]


def test_expand_max_chunks_edge_values(tmp_path):
    """expand_max_chunks of 0 or 1 means zero walk steps — must not crash
    (the walk's empty concatenate) and must equal expansion-off output."""
    idx, bm25 = make_corpus(tmp_path, seed=7)
    base = EnsembleRetriever(idx, EMB.encode, bm25=bm25, k=4,
                             enable_expand=False)
    for emc in (0, 1):
        eng = EnsembleRetriever(idx, EMB.encode, bm25=bm25, k=4,
                                enable_expand=True, expand_max_chunks=emc)
        got = eng.invoke("zeekr revenue", ["delivery europe"])
        want = base.invoke("zeekr revenue", ["delivery europe"])
        assert strip_rows(got) == strip_rows(want)


def test_duplicate_title_strings_still_retrieve(tmp_path):
    """Duplicate title strings must map carriers to the FIRST title index
    (the one the tie-broken title search returns)."""
    import jax.numpy as jnp

    from veritasfi_tpu.ingest.contract import ChunkRecord, hash_content
    from veritasfi_tpu.ingest.corpus import build_corpus_index

    records = []
    for i in range(6):
        content = f"chunk {i} zeekr revenue tok{i}"
        records.append(ChunkRecord(
            content=content, filename="f.json", page_number=i + 1,
            date_published="2024-01-15", doc_id=hash_content(content),
            global_id=i, title_summary="SAME TITLE"))
    idx = build_corpus_index(records, ["SAME TITLE", "SAME TITLE"],
                             embed_fn=EMB.encode)
    eng = EnsembleRetriever(idx, EMB.encode, k=3)
    chunks = eng.invoke("zeekr revenue", [])
    titled = [c for c in chunks if c["retriever"] == "Title Summary"]
    assert titled, "title path retrieved nothing for a duplicated title"
