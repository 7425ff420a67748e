"""retrieval.corpus_dtype: bfloat16 — the bf16-resident corpus storage mode.

On real TPUs this routes large-corpus dense search through the fused Pallas
MIPS kernel (ops/pallas_mips.py); everywhere (including this CPU suite) the
contract is: scores are exact f32-accumulated products of the bf16-rounded
stored embeddings with bf16-cast queries, ties break FAISS-style (index
asc), and every backend (dense kernel, streaming body, sharded mesh)
produces the same ordering for the same storage dtype.

Reference semantics covered: exact IndexFlatIP search
(faissRetriever.py:18-37) at BASELINE config #5's storage scale.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_ensemble import EMB, make_corpus, strip_rows
from veritasfi_tpu.ingest.corpus import normalize_rows
from veritasfi_tpu.ops.topk import dense_topk_large
from veritasfi_tpu.retrieval.ensemble import EnsembleRetriever


def np_topk_faiss(corpus_f32: np.ndarray, queries_f32: np.ndarray, k: int):
    """Expected exact top-k with FAISS tie order, computed in numpy fp32."""
    s = queries_f32 @ corpus_f32.T
    idx = np.argsort(-s, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(s, idx, axis=1), idx


def bf16_round(x: np.ndarray) -> np.ndarray:
    return np.asarray(jnp.asarray(x, jnp.bfloat16).astype(jnp.float32))


def test_dense_topk_large_bf16_matches_numpy():
    rng = np.random.default_rng(7)
    n, d, q, k = 700, 48, 5, 9
    corpus = jnp.asarray(normalize_rows(rng.normal(size=(n, d))),
                         jnp.bfloat16)
    queries = jnp.asarray(normalize_rows(rng.normal(size=(q, d))))
    s, i = jax.device_get(dense_topk_large(corpus, queries, k, block=128))
    exp_s, exp_i = np_topk_faiss(
        np.asarray(corpus.astype(jnp.float32)),
        bf16_round(np.asarray(queries)), k)
    np.testing.assert_array_equal(i, exp_i)
    np.testing.assert_allclose(s, exp_s, rtol=2e-6, atol=2e-6)


def test_streaming_body_bf16_matches_dense_body(tmp_path):
    """bf16 corpus through _search_body vs _search_body_streaming: both
    cast queries to bf16 and must agree on every output (same products,
    different schedules)."""
    from veritasfi_tpu.retrieval.ensemble import (_search_body,
                                                  _search_body_streaming)

    rng = np.random.default_rng(11)
    n, d, q = 400, 32, 3
    corpus = jnp.asarray(normalize_rows(rng.normal(size=(n, d))),
                         jnp.bfloat16)
    ts = jnp.asarray(normalize_rows(rng.normal(size=(13, d))))
    qe = jnp.asarray(normalize_rows(rng.normal(size=(q, d))))
    prev = jnp.asarray(
        np.where(np.arange(n) % 6 == 0, -1, np.arange(n) - 1).astype(np.int32))
    nxt = jnp.asarray(
        np.where(np.arange(n) % 4 == 0, -1, (np.arange(n) + 1) % n).astype(
            np.int32))
    for expand in (True, False):
        a = jax.device_get(_search_body(
            corpus, ts, qe, prev, nxt, 8, 4, 3, 100, expand))
        b = jax.device_get(_search_body_streaming(
            corpus, ts, qe, prev, nxt, 8, 4, 3, 100, expand, block=96))
        for x, y, name in zip(a, b, ["top_s", "top_i", "ts_s", "ts_i",
                                     "cand", "eff"]):
            np.testing.assert_allclose(x, y, rtol=1e-6, atol=1e-6,
                                       err_msg=name)


def test_ensemble_bf16_dense_ordering_matches_stored_matrix(tmp_path):
    """The bf16 engine's dense results equal exact numpy top-k over the
    ACTUAL stored (rounded) device matrix — storage rounding is the only
    delta vs fp32."""
    idx, bm25 = make_corpus(tmp_path, seed=21)
    eng = EnsembleRetriever(idx, EMB.encode, bm25=bm25, k=6,
                            corpus_dtype="bfloat16")
    assert eng.dense.corpus.dtype == jnp.bfloat16
    q = "zeekr revenue margin europe"
    qe = normalize_rows(np.asarray(EMB.encode([q]), np.float32))
    search = eng._search(qe)
    stored = np.asarray(eng.dense.corpus.astype(jnp.float32))
    exp_s, exp_i = np_topk_faiss(stored, bf16_round(qe), 6)
    np.testing.assert_array_equal(search["top_i"][0], exp_i[0])
    np.testing.assert_allclose(search["top_s"][0], exp_s[0],
                               rtol=2e-6, atol=2e-6)


@pytest.mark.parametrize("expand", [False, True])
def test_ensemble_bf16_sharded_matches_single(tmp_path, expand):
    """Sharded bf16 corpus == single-device bf16 corpus, chunk for chunk
    (same stored rounding, same bf16-cast queries on every shard)."""
    from veritasfi_tpu.parallel import make_mesh

    idx, bm25 = make_corpus(tmp_path, seed=23)
    mesh = make_mesh([("corpus", 8)])
    single = EnsembleRetriever(idx, EMB.encode, bm25=bm25, k=6,
                               enable_expand=expand,
                               corpus_dtype="bfloat16")
    dist = EnsembleRetriever(idx, EMB.encode, bm25=bm25, k=6,
                             enable_expand=expand, mesh=mesh,
                             corpus_dtype="bfloat16")
    for q in ["zeekr revenue margin", "stores europe delivery"]:
        hyde = [f"hypothetical about {q}"]
        a = strip_rows(single.invoke(q, hyde))
        b = strip_rows(dist.invoke(q, hyde))
        assert len(a) == len(b), (len(a), len(b))
        for x, y in zip(a, b):
            assert x["retriever"] == y["retriever"]
            assert x["metadata"]["doc_id"] == y["metadata"]["doc_id"]
            assert x["bundle_id"] == y["bundle_id"]
            assert abs(x["score"] - y["score"]) < 1e-4


def test_engine_threads_corpus_dtype(tmp_path):
    from conftest import make_processed_file, synth_chunk
    from veritasfi_tpu.config import Config
    from veritasfi_tpu.engine import RAGEngine

    src = tmp_path / "src"
    src.mkdir()
    make_processed_file(src / "a.json", "2024-01-01",
                        [synth_chunk(i) for i in range(12)])
    cfg = Config()
    cfg.persist_directory = str(tmp_path / "idx")
    cfg.retrieval.corpus_dtype = "bfloat16"
    engine = RAGEngine(cfg, embed_fn=EMB.encode)
    engine.create_collection("c", str(src))
    r = engine.create_retriever(4, "c")
    assert r.dense.corpus.dtype == jnp.bfloat16
    assert r.invoke("chunk 3 text topic", [])  # end-to-end still works


def test_invalid_corpus_dtype_rejected(tmp_path):
    idx, bm25 = make_corpus(tmp_path, seed=29, num_files=1,
                            chunks_per_file=8)
    with pytest.raises(ValueError, match="corpus_dtype"):
        EnsembleRetriever(idx, EMB.encode, bm25=bm25, k=3,
                          corpus_dtype="float16")


def test_fused_serve_bf16_matches_classic_bf16():
    """FusedServePath with corpus_dtype=bfloat16: same candidate list and
    selection as the bf16 classic engine (both search the identically
    rounded stored matrix), and the serve path honors the dtype (its
    device matrix is bf16, not a shadow fp32 copy)."""
    from test_fused_serve import (QUERY_TIME, oracle, synth_corpus)
    from veritasfi_tpu.models.encoder import TextEncoder
    from veritasfi_tpu.models.encoder_reranker import EncoderReranker
    from veritasfi_tpu.retrieval.bm25 import BM25Index
    from veritasfi_tpu.retrieval.fused_serve import FusedServePath

    rng = np.random.default_rng(31)
    n = 200
    index = synth_corpus(n, rng)
    bm25 = BM25Index.build(index.texts, index.doc_ids)
    encoder = TextEncoder(preset="tiny-test", dtype=jnp.float32,
                          max_length=64)
    d = encoder.encode(["probe"]).shape[1]
    index.embeddings = normalize_rows(
        rng.normal(size=(n, d)).astype(np.float32))
    index.ts_embeddings = normalize_rows(
        rng.normal(size=(index.ts_embeddings.shape[0], d)).astype(
            np.float32))
    reranker = EncoderReranker(preset="tiny-test", passage_max_length=64)
    engine = EnsembleRetriever(index, encoder.encode, bm25=bm25, k=5,
                               encoder=encoder, corpus_dtype="bfloat16")
    cap = 15
    fused = FusedServePath(index, reranker, encoder=encoder, bm25=bm25,
                           k=5, rerank_cap=cap, corpus_dtype="bfloat16")
    assert fused._emb.dtype == jnp.bfloat16
    for t in index.texts:
        reranker.tokenize_passage(t)
    for query, hyde in [("revenue margin europe", ["battery capex cash"]),
                        ("tok3 tok7 battery", [])]:
        full, chunks_o, scores_o, sel_o = oracle(
            engine, reranker, index, query, hyde, cap)
        chunks_f, sel_f, diag = fused.serve(query, hyde, QUERY_TIME)
        assert [c["_row"] for c in chunks_f] == [c["_row"] for c in chunks_o]
        assert sel_f == sel_o


def test_stack_shares_retriever_device_matrix(tmp_path):
    """build_stack's fused serve path must reuse the retriever's device
    matrices (identity, not a second multi-GB copy) and respect
    retrieval.corpus_dtype."""
    from conftest import make_processed_file, synth_chunk
    from veritasfi_tpu.config import Config
    from veritasfi_tpu.models.encoder_reranker import EncoderReranker
    from veritasfi_tpu.stack import build_stack

    src = tmp_path / "src"
    src.mkdir()
    make_processed_file(src / "a.json", "2024-01-01",
                        [synth_chunk(i) for i in range(16)])
    cfg = Config()
    cfg.persist_directory = str(tmp_path / "idx")
    cfg.retrieval.corpus_dtype = "bfloat16"
    cfg.llm.base_url = ""
    cfg.rerank.max_candidates = 12   # fused serve is gated on the cap
    from veritasfi_tpu.engine import RAGEngine

    engine = RAGEngine(cfg, embed_fn=EMB.encode)
    engine.create_collection("c", str(src))
    rr = EncoderReranker(preset="tiny-test", passage_max_length=64)
    stack = build_stack(cfg, collections={"c": 4}, embed_fn=EMB.encode,
                        reranker=rr)
    try:
        assert stack.retrieval_batcher is not None
        path = stack.retrieval_batcher.serve_path
        r0 = stack.chat_service.retrievers[0]
        assert path._emb is r0.dense.corpus
        assert path._emb.dtype == jnp.bfloat16
        if r0.ts_dense is not None:
            assert path._ts_emb is r0.ts_dense.corpus
    finally:
        stack.close()
