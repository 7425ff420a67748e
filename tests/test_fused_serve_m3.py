"""In-program M3 fusion on the fused serve path.

The classic path hooks M3 candidate-stage fusion as a separate
gather+score dispatch after EnsembleRetriever.invoke (retrieval.m3_fusion
-> M3CandidateScorer.rerank_chunks). The fused serve path folds the SAME
math between its fusion loop and pair assembly. These tests pin:

  * the chained device query-encode (trunk + heads + device dedup) against
    the host encode_multi(dedup_query_ids=True) path;
  * fused-serve-with-M3 against the classic oracle (invoke with m3_scorer,
    cap, rank_chunk) — candidate rows, m3_score annotations, selection —
    whenever the over-emit pool holds every candidate;
  * the out-of-range bundle-id rule in the similarity veto (host
    rank_chunk == device _rank_chunk_device), which only M3 reordering can
    trigger.
"""

import numpy as np
import pytest

from veritasfi_tpu.ingest.corpus import normalize_rows
from veritasfi_tpu.models.encoder import TextEncoder
from veritasfi_tpu.models.encoder_reranker import EncoderReranker
from veritasfi_tpu.models.m3_heads import M3Encoder, dedup_sparse_by_id
from veritasfi_tpu.rerank.fusion import (chunk_time_scores, rank_chunk)
from veritasfi_tpu.retrieval.bm25 import BM25Index
from veritasfi_tpu.retrieval.ensemble import EnsembleRetriever
from veritasfi_tpu.retrieval.fused_serve import FusedServePath
from veritasfi_tpu.retrieval.m3_scorer import (M3CandidateScorer,
                                               dedup_sparse_device)

from test_fused_serve import QUERY_TIME, synth_corpus

# slow tier: excluded from the default run (pytest.ini -m 'not slow');
# the full matrix runs with `pytest -m ""`
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def m3_enc():
    return M3Encoder(preset="tiny-test", max_length=64, seed=3)


# -- device-side query dedup ----------------------------------------------
def test_dedup_sparse_device_matches_host():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    for _ in range(20):
        L = int(rng.integers(4, 24))
        ids = rng.integers(0, 6, size=(1, L)).astype(np.int32)  # repeats
        w = np.where(rng.random((1, L)) < 0.2, 0.0,
                     rng.random((1, L))).astype(np.float32)
        tok = rng.random((1, L)) < 0.8
        w = np.where(tok, w, 0.0).astype(np.float32)   # head zeroes non-tok
        host = dedup_sparse_by_id(ids, w, tok)[0]
        dev = np.asarray(dedup_sparse_device(
            jnp.asarray(ids[0]), jnp.asarray(w[0]), jnp.asarray(tok[0])))
        np.testing.assert_allclose(dev, host, atol=1e-7)


def test_encode_query_device_matches_host(m3_enc):
    scorer = M3CandidateScorer(m3_enc, ["quarterly revenue grew",
                                        "margin guidance improved"],
                               doc_max_length=32)
    q = "what was the quarterly revenue revenue growth"
    ids_d, dense_d, w_d, col_d, valid_d = map(
        np.asarray, scorer.encode_query_device(q))
    e = m3_enc.encode_multi([q], dedup_query_ids=True)
    np.testing.assert_array_equal(ids_d, e.ids[0])
    np.testing.assert_allclose(dense_d, e.dense[0], atol=1e-5)
    np.testing.assert_allclose(w_d, e.sparse[0], atol=1e-5)
    np.testing.assert_allclose(col_d, e.colbert[0], atol=1e-5)
    np.testing.assert_array_equal(valid_d, e.token_mask[0] | e.mask[0])
    # cached: second call returns the same device arrays
    again = scorer.encode_query_device(q)
    assert again[1] is scorer.encode_query_device(q)[1]


# -- fused serve vs classic oracle ----------------------------------------
def _mk_stack(rng, n=220, seed_enc=0):
    import jax.numpy as jnp

    index = synth_corpus(n, rng)
    encoder = TextEncoder(preset="tiny-test", dtype=jnp.float32,
                          max_length=64)
    d = encoder.encode(["probe"]).shape[1]
    index.embeddings = normalize_rows(
        rng.normal(size=(n, d)).astype(np.float32))
    index.ts_embeddings = normalize_rows(rng.normal(
        size=(index.ts_embeddings.shape[0], d)).astype(np.float32))
    bm25 = BM25Index.build(index.texts, index.doc_ids)
    reranker = EncoderReranker(preset="tiny-test", passage_max_length=64)
    m3 = M3Encoder(preset="tiny-test", max_length=64, seed=seed_enc)
    scorer = M3CandidateScorer(m3, index.texts, doc_max_length=32)
    return index, encoder, reranker, bm25, scorer


def oracle_m3(engine, reranker, index, query, hyde, cap):
    """Classic path with M3: invoke (reorders + annotates) -> cap ->
    rerank -> rank_chunk."""
    chunks = engine.invoke(query, hyde)[:cap]
    rows = reranker.encode_pairs_cached(
        query, [c["page_content"] for c in chunks])
    emb = normalize_rows(index.embeddings)[[c["_row"] for c in chunks]]
    scores, sim = reranker.score_and_sim(rows, emb)
    tscores = chunk_time_scores(chunks, QUERY_TIME)
    sel = rank_chunk(chunks, scores, tscores, sim, chunk_topk=5)
    return chunks, scores, sel


@pytest.mark.parametrize("seed,expand", [(0, True), (4, False)])
def test_fused_serve_m3_matches_classic(seed, expand):
    rng = np.random.default_rng(seed)
    index, encoder, reranker, bm25, scorer = _mk_stack(rng)
    engine = EnsembleRetriever(index, encoder.encode, bm25=bm25, k=5,
                               enable_expand=expand, depth=50,
                               encoder=encoder, m3_scorer=scorer)
    engine.expand_trigger = 0.05
    engine.expand_accept = 0.02
    cap = 20
    fused = FusedServePath(
        index, reranker, encoder=encoder, bm25=bm25, k=5,
        enable_expand=expand, depth=50, expand_trigger=0.05,
        expand_accept=0.02, rerank_cap=cap,
        m3_scorer=scorer, m3_pool=512)   # pool >> any candidate count
    for t in index.texts:
        reranker.tokenize_passage(t)

    for query, hyde in [
        ("revenue margin europe", ["delivery store china revenue",
                                   "battery capex cash margin"]),
        ("tok3 tok7 battery", []),
        ("cash store delivery", ["revenue tok1 tok2"]),
    ]:
        chunks_o, scores_o, sel_o = oracle_m3(
            engine, reranker, index, query, hyde, cap)
        chunks_f, sel_f, diag = fused.serve(query, hyde, QUERY_TIME)
        label = f"seed={seed} expand={expand} q={query!r}"
        assert [c["_row"] for c in chunks_f] == \
            [c["_row"] for c in chunks_o], label
        assert [c["bundle_id"] for c in chunks_f] == \
            [c["bundle_id"] for c in chunks_o], label
        assert all("m3_score" in c for c in chunks_f)
        np.testing.assert_allclose(
            [c["m3_score"] for c in chunks_f],
            [c["m3_score"] for c in chunks_o], atol=1e-4, err_msg=label)
        np.testing.assert_allclose(
            diag["logits"][: len(chunks_o)], scores_o, rtol=2e-4, atol=2e-4)
        assert sel_f == sel_o, label


def test_fused_serve_m3_wave_and_batcher_match_serial():
    from veritasfi_tpu.serving.retrieval_batcher import RetrievalBatcher

    rng = np.random.default_rng(9)
    index, encoder, reranker, bm25, scorer = _mk_stack(rng, n=120)
    fused = FusedServePath(index, reranker, encoder=encoder, bm25=bm25,
                           k=5, enable_expand=False, rerank_cap=12,
                           m3_scorer=scorer, m3_pool=256)
    requests = [(f"revenue tok{i} margin", [f"cash tok{i+1}"], QUERY_TIME)
                for i in range(5)]
    serial = [fused.serve(q, h, t) for q, h, t in requests]
    wave = fused.serve_wave(requests)
    wave_b = fused.serve_wave(requests, batch_rerank=True)
    for (c1, s1, _), (c2, s2, _), (c3, s3, _) in zip(serial, wave, wave_b):
        assert [c["_row"] for c in c1] == [c["_row"] for c in c2]
        assert [c["_row"] for c in c1] == [c["_row"] for c in c3]
        np.testing.assert_allclose([c["m3_score"] for c in c1],
                                   [c["m3_score"] for c in c3], atol=1e-6)
        assert s1 == s2 == s3
    batcher = RetrievalBatcher(fused, max_batch=4, max_wait_ms=20.0)
    try:
        got = batcher.retrieve(*requests[0], 60)
        assert [c["_row"] for c in got[0]] == \
            [c["_row"] for c in serial[0][0]]
    finally:
        batcher.close()


def test_fused_serve_m3_pool_caps_like_emission_then_reorder():
    """When the pool is SMALLER than the candidate total, the fused path's
    contract is: emission-capped pool (classic chunks[:pool] semantics)
    -> M3 stable reorder -> top rerank_cap. Pinned against a no-M3 fused
    run at rerank_cap=pool plus a host-side reorder."""
    rng = np.random.default_rng(13)
    index, encoder, reranker, bm25, scorer = _mk_stack(rng)
    pool, cap = 16, 8
    common = dict(encoder=encoder, bm25=bm25, k=5, enable_expand=True,
                  depth=50, expand_trigger=0.05, expand_accept=0.02)
    plain = FusedServePath(index, reranker, rerank_cap=pool, **common)
    fused = FusedServePath(index, reranker, rerank_cap=cap,
                           m3_scorer=scorer, m3_pool=pool, **common)
    q, hyde = "revenue margin europe", ["delivery store china"]
    chunks_p, _, _ = plain.serve(q, hyde, QUERY_TIME)
    assert len(chunks_p) == pool          # fixture overflows the pool
    expect = scorer.rerank_chunks(q, chunks_p)[:cap]
    chunks_f, _, _ = fused.serve(q, hyde, QUERY_TIME)
    assert [c["_row"] for c in chunks_f] == [c["_row"] for c in expect]
    np.testing.assert_allclose([c["m3_score"] for c in chunks_f],
                               [c["m3_score"] for c in expect], atol=1e-4)


def test_fused_serve_m3_split_stage_path_matches_mega():
    """The int8 reranker runs search and rerank as two CHAINED programs
    (enqueue's ``split`` branch); the m3_top section must ride through
    that plumbing too. Forced here by flipping the arch flag the branch
    keys on — the module (and therefore the math) is unchanged, so the
    outputs must be identical to the mega-program's."""
    import dataclasses

    rng = np.random.default_rng(17)
    index, encoder, reranker, bm25, scorer = _mk_stack(rng, n=120)
    fused = FusedServePath(index, reranker, encoder=encoder, bm25=bm25,
                           k=5, enable_expand=False, rerank_cap=12,
                           m3_scorer=scorer, m3_pool=256)
    q, hyde = "revenue margin europe", ["delivery store china"]
    mega = fused.serve(q, hyde, QUERY_TIME)
    if not hasattr(reranker.arch, "mlp_impl"):
        pytest.skip("arch has no mlp_impl knob")
    reranker.arch = dataclasses.replace(reranker.arch, mlp_impl="int8")
    try:
        split = fused.serve(q, hyde, QUERY_TIME)
    finally:
        reranker.arch = dataclasses.replace(reranker.arch, mlp_impl="xla")
    assert [c["_row"] for c in split[0]] == [c["_row"] for c in mega[0]]
    np.testing.assert_allclose([c["m3_score"] for c in split[0]],
                               [c["m3_score"] for c in mega[0]], atol=1e-6)
    assert split[1] == mega[1]


# -- out-of-range bundle ids in the similarity veto ------------------------
def test_rank_chunk_oob_bundle_id_no_crash_and_matches_device():
    """An M3 reorder can promote a chunk whose bundle_id exceeds the capped
    list length; the reference quirk indexes the chunk-level sim matrix
    with bundle ids, so such ids must sit out the similarity veto (not
    crash) — and the host and device selections must agree."""
    import jax.numpy as jnp

    from veritasfi_tpu.retrieval.fused_serve import _rank_chunk_device

    rng = np.random.default_rng(5)
    cap = 6
    # bundle id 9 >= cap: first-ranked, then high-similarity rows follow
    groups = np.array([9, 0, 1, 2, 3, 4], np.int32)
    chunks = [{"bundle_id": int(g)} for g in groups]
    scores = np.array([5.0, 4.0, 3.0, 2.0, 1.0, 0.5], np.float32)
    tscores = np.zeros(cap, np.float32)
    sim = rng.random((cap, cap)).astype(np.float32)
    sim[1, :] = 0.95          # row 1 similar to everything selected so far
    sel_host = rank_chunk(chunks, scores, tscores, sim, chunk_topk=4,
                          similar_threshold=0.9)
    assert sel_host            # no IndexError, something selected
    sel_dev, cnt = _rank_chunk_device(
        jnp.asarray(scores), jnp.asarray(groups),
        jnp.ones(cap, bool), jnp.asarray(sim),
        chunk_topk=4, sim_threshold=0.9)
    got = [int(g) for g in np.asarray(sel_dev)[: int(cnt)]][::-1]
    assert got == sel_host


# -- from_arrays constructor ------------------------------------------------
def test_scorer_from_arrays_matches_encoded(m3_enc):
    texts = ["quarterly revenue grew", "margin guidance improved",
             "cash flow was strong"]
    a = M3CandidateScorer(m3_enc, texts, doc_max_length=32)
    b = M3CandidateScorer.from_arrays(m3_enc, a.d_dense, a.d_ids,
                                      a.d_sparse, a.d_col, a.d_mask,
                                      a.d_tok)
    q = "how did revenue grow"
    np.testing.assert_allclose(a.score_rows(q, [0, 1, 2]),
                               b.score_rows(q, [0, 1, 2]), atol=1e-6)
    assert b.hbm_bytes == a.hbm_bytes


# -- stack wiring ------------------------------------------------------------
def test_build_stack_wires_m3_into_serve_path(tmp_path):
    import json

    from veritasfi_tpu.config import Config
    from veritasfi_tpu.stack import build_stack

    src = tmp_path / "src"
    src.mkdir()
    # header start/end is the KEEP page range — cover every page
    rows = [{"start": 1, "end": 99, "date_published": "2024-01-01"}]
    for i in range(8):
        rows.append({"content": f"chunk {i} revenue tok{i} growth detail",
                     "page_number": i + 1})
    (src / "a.json").write_text(json.dumps(rows))

    cfg = Config(persist_directory=str(tmp_path / "idx"))
    cfg.encoder.model_name = "nonexistent-model"    # hash embed + tiny M3
    cfg.retrieval.native_bm25 = False
    cfg.retrieval.m3_fusion = True
    cfg.retrieval.m3_doc_max_length = 32
    cfg.rerank.model_name = "tiny-test"
    cfg.rerank.max_candidates = 10
    from veritasfi_tpu.engine import RAGEngine

    eng = RAGEngine(cfg)
    eng.create_collection(cfg.collection, str(src))
    stack = build_stack(cfg)
    try:
        assert stack.retrieval_batcher is not None
        path = stack.retrieval_batcher.serve_path
        assert path.m3 is not None
        assert path._fuse_cap == cfg.retrieval.m3_candidate_pool
        chunks, sel, _ = path.serve("revenue tok3", [], "2024-06-01")
        assert chunks and all("m3_score" in c for c in chunks)
        scores = [c["m3_score"] for c in chunks]
        assert scores == sorted(scores, reverse=True)
    finally:
        stack.close()
