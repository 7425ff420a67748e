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
