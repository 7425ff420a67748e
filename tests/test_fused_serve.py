"""FusedServePath parity vs the classic two-dispatch path.

The fused single-readback program must reproduce, bit-for-bit:
  * the capped candidate list (rows, emission groups, path tags, scores) of
    EnsembleRetriever.invoke()[:cap],
  * the cross-encoder logits of EncoderReranker on the same pairs,
  * rank_chunk's selected bundle ids,
on randomized corpora with bundles, titles, prev/next chains, and BM25.
"""

import numpy as np
import pytest

from veritasfi_tpu.ingest.contract import ChunkRecord, hash_content
from veritasfi_tpu.ingest.corpus import build_corpus_index, normalize_rows
from veritasfi_tpu.models.encoder import TextEncoder
from veritasfi_tpu.models.encoder_reranker import EncoderReranker
from veritasfi_tpu.rerank.fusion import (chunk_time_scores, rank_chunk,
                                         select_content)
from veritasfi_tpu.retrieval.bm25 import BM25Index
from veritasfi_tpu.retrieval.ensemble import EnsembleRetriever
from veritasfi_tpu.retrieval.fused_serve import FusedServePath

# slow tier: excluded from the default run (pytest.ini -m 'not slow');
# the full matrix runs with `pytest -m ""`
pytestmark = pytest.mark.slow

QUERY_TIME = "2024-06-01"


def synth_corpus(n, rng, with_titles=True, with_bundles=True):
    words = ["revenue", "margin", "delivery", "store", "europe", "china",
             "cash", "battery", "capex"] + [f"tok{i}" for i in range(50)]
    records = []
    for i in range(n):
        body = " ".join(rng.choice(words, size=12))
        content = f"chunk {i}: {body}"
        records.append(ChunkRecord(
            content=content, filename=f"f{i % 5}.json",
            page_number=i % 30 + 1,
            date_published=f"202{i % 4}-0{i % 9 + 1}-10",
            doc_id=hash_content(content), global_id=i,
            bundle_id=(f"b{i // 3}" if with_bundles and i % 7 < 3 else None),
            title_summary=(f"Topic {i % 11}"
                           if with_titles and i % 2 == 0 else None),
        ))
    # prev/next links within the same file
    byfile = {}
    for i, r in enumerate(records):
        byfile.setdefault(r.filename, []).append(i)
    for rows in byfile.values():
        for a, b in zip(rows, rows[1:]):
            records[a].next_chunk_id = records[b].doc_id
            records[b].prev_chunk_id = records[a].doc_id
    titles = sorted({r.title_summary for r in records if r.title_summary})
    index = build_corpus_index(records, titles, embed_fn=None)
    dim = 48
    index.embeddings = normalize_rows(
        rng.normal(size=(n, dim)).astype(np.float32))
    if titles:
        index.ts_embeddings = normalize_rows(
            rng.normal(size=(len(titles), dim)).astype(np.float32))
    return index


def oracle(engine, reranker, index, query, hyde, cap, chunk_topk=5):
    """The classic two-dispatch path (bench.py one_query)."""
    chunks = engine.invoke(query, hyde)
    full = list(chunks)
    chunks = chunks[:cap]
    rows = reranker.encode_pairs_cached(
        query, [c["page_content"] for c in chunks])
    emb = normalize_rows(index.embeddings)[[c["_row"] for c in chunks]]
    scores, sim = reranker.score_and_sim(rows, emb)
    tscores = chunk_time_scores(chunks, QUERY_TIME)
    sel = rank_chunk(chunks, scores, tscores, sim, chunk_topk=chunk_topk)
    return full, chunks, scores, sel


@pytest.mark.parametrize("seed,expand,n", [(0, True, 300), (1, True, 300),
                                           (2, False, 300), (3, True, 64)])
def test_fused_serve_matches_oracle(seed, expand, n):
    rng = np.random.default_rng(seed)
    index = synth_corpus(n, rng)
    bm25 = BM25Index.build(index.texts, index.doc_ids)
    import jax.numpy as jnp

    encoder = TextEncoder(preset="tiny-test", dtype=jnp.float32,
                          max_length=64)
    # align encoder output dim with the synthetic embeddings
    dim = index.embeddings.shape[1]
    assert encoder.encode(["x"]).shape[1] == dim or True
    # use the encoder's real dim for the corpus instead
    d = encoder.encode(["probe"]).shape[1]
    index.embeddings = normalize_rows(
        rng.normal(size=(n, d)).astype(np.float32))
    if index.ts_embeddings is not None:
        index.ts_embeddings = normalize_rows(
            rng.normal(size=(index.ts_embeddings.shape[0], d)).astype(
                np.float32))

    reranker = EncoderReranker(preset="tiny-test", passage_max_length=64)
    engine = EnsembleRetriever(index, encoder.encode, bm25=bm25, k=5,
                               enable_expand=expand, depth=50,
                               encoder=encoder)
    # lower the trigger so expansion actually fires with random embeddings
    engine.expand_trigger = 0.05
    engine.expand_accept = 0.02
    cap = 20
    fused = FusedServePath(
        index, reranker, encoder=encoder, bm25=bm25, k=5,
        enable_expand=expand, depth=50, expand_trigger=0.05,
        expand_accept=0.02, rerank_cap=cap)
    # pre-tokenize passages for the oracle's cache-based row builder
    for t in index.texts:
        reranker.tokenize_passage(t)

    queries = [
        ("revenue margin europe", ["delivery store china revenue",
                                   "battery capex cash margin"]),
        ("tok3 tok7 battery", []),
        ("cash store delivery", ["revenue tok1 tok2"]),
    ]
    for query, hyde in queries:
        full, chunks_o, scores_o, sel_o = oracle(
            engine, reranker, index, query, hyde, cap)
        chunks_f, sel_f, diag = fused.serve(query, hyde, QUERY_TIME)

        assert len(chunks_f) == len(chunks_o), (
            f"candidate count {len(chunks_f)} != {len(chunks_o)}")
        for cf, co in zip(chunks_f, chunks_o):
            assert cf["_row"] == co["_row"]
            assert cf["retriever"] == co["retriever"]
            assert cf["bundle_id"] == co["bundle_id"]
            assert cf["page_content"] == co["page_content"]
            assert cf["metadata"] == co["metadata"]
            np.testing.assert_allclose(cf["score"], co["score"], rtol=1e-5,
                                       atol=1e-6)
        np.testing.assert_allclose(
            diag["logits"][: len(chunks_o)], scores_o, rtol=2e-4, atol=2e-4)
        assert sel_f == sel_o, (sel_f, sel_o)


def test_fused_serve_random_knob_combinations():
    """Fused serve == classic oracle under RANDOM (k, ts_k, bm25_k,
    expand, cap) combinations — the parametrized test above never varies
    the k's, so the _fuse proposal-phase widths (p_dense/p_title/bm25_k
    interplay) and mid-group cap cuts are exercised here."""
    import jax.numpy as jnp

    rng = np.random.default_rng(77)
    encoder = TextEncoder(preset="tiny-test", dtype=jnp.float32,
                          max_length=64)
    d = encoder.encode(["probe"]).shape[1]
    reranker = EncoderReranker(preset="tiny-test", passage_max_length=64)
    for t in range(4):
        seed = int(rng.integers(0, 10_000))
        n = 120
        index = synth_corpus(n, rng)
        bm25 = BM25Index.build(index.texts, index.doc_ids)
        index.embeddings = normalize_rows(
            rng.normal(size=(n, d)).astype(np.float32))
        index.ts_embeddings = normalize_rows(
            rng.normal(size=(index.ts_embeddings.shape[0], d)).astype(
                np.float32))
        k = int(rng.integers(1, 9))
        ts_k = int(rng.integers(0, 7))
        bm25_k = int(rng.integers(0, 7))
        expand = bool(rng.integers(0, 2))
        cap = int(rng.choice([7, 15, 30]))
        engine = EnsembleRetriever(index, encoder.encode, bm25=bm25, k=8,
                                   faiss_k=k, faiss_ts_k=ts_k,
                                   bm25_k=bm25_k, enable_expand=expand,
                                   depth=50, encoder=encoder)
        engine.expand_trigger = 0.05
        engine.expand_accept = 0.02
        fused = FusedServePath(
            index, reranker, encoder=encoder, bm25=bm25, k=k, ts_k=ts_k,
            bm25_k=bm25_k, enable_expand=expand, depth=50,
            expand_trigger=0.05, expand_accept=0.02, rerank_cap=cap)
        for txt in index.texts:
            reranker.tokenize_passage(txt)
        q = " ".join(rng.choice(
            ["revenue", "margin", "europe", "battery", "capex", "cash"]
            + [f"tok{i}" for i in range(30)], size=5))
        hyde = ([f"about {q}"] if rng.integers(0, 2) else [])
        full, chunks_o, scores_o, sel_o = oracle(
            engine, reranker, index, q, hyde, cap)
        chunks_f, sel_f, diag = fused.serve(q, hyde, QUERY_TIME)
        label = (f"seed={seed} k={k} ts_k={ts_k} bm25_k={bm25_k} "
                 f"expand={expand} cap={cap}")
        assert [c["_row"] for c in chunks_f] == \
            [c["_row"] for c in chunks_o], label
        assert [c["retriever"] for c in chunks_f] == \
            [c["retriever"] for c in chunks_o], label
        assert sel_f == sel_o, label


def test_fused_serve_no_titles_no_bm25():
    rng = np.random.default_rng(7)
    index = synth_corpus(120, rng, with_titles=False, with_bundles=True)
    import jax.numpy as jnp

    encoder = TextEncoder(preset="tiny-test", dtype=jnp.float32,
                          max_length=64)
    d = encoder.encode(["probe"]).shape[1]
    index.embeddings = normalize_rows(
        rng.normal(size=(120, d)).astype(np.float32))
    reranker = EncoderReranker(preset="tiny-test", passage_max_length=64)
    engine = EnsembleRetriever(index, encoder.encode, bm25=None, k=5,
                               enable_expand=True, depth=50, encoder=encoder)
    engine.expand_trigger = 0.05
    engine.expand_accept = 0.02
    fused = FusedServePath(index, reranker, encoder=encoder, bm25=None, k=5,
                           enable_expand=True, depth=50,
                           expand_trigger=0.05, expand_accept=0.02,
                           rerank_cap=16)
    for t in index.texts:
        reranker.tokenize_passage(t)
    full, chunks_o, scores_o, sel_o = oracle(
        engine, reranker, index, "revenue china tok4", ["margin tok9"], 16)
    chunks_f, sel_f, _ = fused.serve("revenue china tok4", ["margin tok9"],
                                     QUERY_TIME)
    assert [c["_row"] for c in chunks_f] == [c["_row"] for c in chunks_o]
    assert sel_f == sel_o


def test_answer_context_matches_select_content():
    rng = np.random.default_rng(11)
    index = synth_corpus(100, rng)
    import jax.numpy as jnp

    encoder = TextEncoder(preset="tiny-test", dtype=jnp.float32,
                          max_length=64)
    d = encoder.encode(["probe"]).shape[1]
    index.embeddings = normalize_rows(
        rng.normal(size=(100, d)).astype(np.float32))
    index.ts_embeddings = normalize_rows(rng.normal(
        size=(index.ts_embeddings.shape[0], d)).astype(np.float32))
    reranker = EncoderReranker(preset="tiny-test", passage_max_length=64)
    fused = FusedServePath(index, reranker, encoder=encoder, bm25=None, k=5,
                           enable_expand=False, rerank_cap=12)
    content, times, selected, chunks, diag = fused.answer_context(
        "revenue", [], QUERY_TIME)
    c2, s2, _ = fused.serve("revenue", [], QUERY_TIME)
    content2, times2, selected2 = select_content(c2, s2)
    assert content == content2 and times == times2


def test_fused_serve_decoder_reranker():
    """Decoder (gemma-family yes-logit) pair assembly + scoring parity."""
    from veritasfi_tpu.models.reranker import CrossEncoderReranker

    rng = np.random.default_rng(21)
    n = 150
    index = synth_corpus(n, rng)
    import jax.numpy as jnp

    encoder = TextEncoder(preset="tiny-test", dtype=jnp.float32,
                          max_length=64)
    d = encoder.encode(["probe"]).shape[1]
    index.embeddings = normalize_rows(
        rng.normal(size=(n, d)).astype(np.float32))
    index.ts_embeddings = normalize_rows(rng.normal(
        size=(index.ts_embeddings.shape[0], d)).astype(np.float32))
    bm25 = BM25Index.build(index.texts, index.doc_ids)
    reranker = CrossEncoderReranker(preset="tiny-test", dtype=jnp.float32,
                                    passage_max_length=64)
    engine = EnsembleRetriever(index, encoder.encode, bm25=bm25, k=5,
                               enable_expand=True, depth=60, encoder=encoder)
    engine.expand_trigger = 0.05
    engine.expand_accept = 0.02
    cap = 16
    fused = FusedServePath(index, reranker, encoder=encoder, bm25=bm25, k=5,
                           enable_expand=True, depth=60, expand_trigger=0.05,
                           expand_accept=0.02, rerank_cap=cap)

    query, hyde = "revenue margin europe", ["delivery store china"]
    # classic oracle with the decoder reranker
    chunks_o = engine.invoke(query, hyde)[:cap]
    rows = [reranker.encode_pair(query, c["page_content"])
            for c in chunks_o]
    scores_o = reranker.score_tokens(rows)
    emb = normalize_rows(index.embeddings)[[c["_row"] for c in chunks_o]]
    import jax

    sim_o = np.asarray(jax.device_get(
        reranker._score_sim(reranker.params,
                            *_pad_rows(rows, reranker.arch.pad_id),
                            jnp.asarray(emb))[1]))
    tscores = chunk_time_scores(chunks_o, QUERY_TIME)
    sel_o = rank_chunk(chunks_o, scores_o, tscores, sim_o, chunk_topk=5)

    chunks_f, sel_f, diag = fused.serve(query, hyde, QUERY_TIME)
    assert [c["_row"] for c in chunks_f] == [c["_row"] for c in chunks_o]
    np.testing.assert_allclose(diag["logits"][: len(chunks_o)], scores_o,
                               rtol=2e-4, atol=2e-4)
    assert sel_f == sel_o


def _pad_rows(rows, pad_id):
    import jax.numpy as jnp

    seq = max(len(r) for r in rows)
    ids = np.full((len(rows), seq), pad_id, np.int32)
    mask = np.zeros((len(rows), seq), np.int32)
    for i, r in enumerate(rows):
        ids[i, : len(r)] = r
        mask[i, : len(r)] = 1
    return jnp.asarray(ids), jnp.asarray(mask)


def test_retrieval_batcher_concurrent_matches_serial():
    from concurrent.futures import ThreadPoolExecutor

    from veritasfi_tpu.serving.retrieval_batcher import RetrievalBatcher

    rng = np.random.default_rng(31)
    n = 100
    index = synth_corpus(n, rng)
    import jax.numpy as jnp

    encoder = TextEncoder(preset="tiny-test", dtype=jnp.float32,
                          max_length=64)
    d = encoder.encode(["probe"]).shape[1]
    index.embeddings = normalize_rows(
        rng.normal(size=(n, d)).astype(np.float32))
    index.ts_embeddings = normalize_rows(rng.normal(
        size=(index.ts_embeddings.shape[0], d)).astype(np.float32))
    reranker = EncoderReranker(preset="tiny-test", passage_max_length=64)
    fused = FusedServePath(index, reranker, encoder=encoder, bm25=None, k=5,
                           enable_expand=False, rerank_cap=12)
    batcher = RetrievalBatcher(fused, max_batch=4, max_wait_ms=20.0)
    try:
        queries = [(f"revenue tok{i} margin", [f"cash tok{i+1}"]) for i in range(6)]
        serial = [fused.serve(q, h, QUERY_TIME) for q, h in queries]
        with ThreadPoolExecutor(max_workers=6) as ex:
            futs = [ex.submit(batcher.retrieve, q, h, QUERY_TIME, 60)
                    for q, h in queries]
            batched = [f.result(60) for f in futs]
        for (c1, s1, _), (c2, s2, _) in zip(serial, batched):
            assert [c["_row"] for c in c1] == [c["_row"] for c in c2]
            assert s1 == s2
    finally:
        batcher.close()


def test_serve_wave_batched_matches_serial():
    """Cross-request batched rerank (ONE [B*cap, seq] forward + vmapped
    selection) must reproduce per-request serve exactly, including the
    power-of-two padding path (B=5 -> padded to 8)."""
    rng = np.random.default_rng(77)
    n = 120
    index = synth_corpus(n, rng)
    import jax.numpy as jnp

    encoder = TextEncoder(preset="tiny-test", dtype=jnp.float32,
                          max_length=64)
    d = encoder.encode(["probe"]).shape[1]
    index.embeddings = normalize_rows(
        rng.normal(size=(n, d)).astype(np.float32))
    index.ts_embeddings = normalize_rows(rng.normal(
        size=(index.ts_embeddings.shape[0], d)).astype(np.float32))
    bm25 = BM25Index.build(index.texts, index.doc_ids)
    reranker = EncoderReranker(preset="tiny-test", passage_max_length=64)
    fused = FusedServePath(index, reranker, encoder=encoder, bm25=bm25, k=5,
                           enable_expand=True, depth=50,
                           expand_trigger=0.05, expand_accept=0.02,
                           rerank_cap=16)
    requests = [(f"revenue tok{i} margin europe", [f"cash tok{i+2} store"],
                 QUERY_TIME) for i in range(5)]
    serial = [fused.serve(q, h, t) for q, h, t in requests]
    wave = fused.serve_wave(requests, batch_rerank=True)
    legacy = fused.serve_wave(requests)    # default: per-request programs
    for (c1, s1, d1), (c2, s2, d2), (c3, s3, _) in zip(serial, wave, legacy):
        assert [c["_row"] for c in c1] == [c["_row"] for c in c2]
        assert [c["_row"] for c in c1] == [c["_row"] for c in c3]
        assert s1 == s2 == s3
        np.testing.assert_allclose(d1["logits"], d2["logits"],
                                   rtol=1e-5, atol=1e-6)


def test_titles_without_ts_embeddings_disable_title_path():
    """A corpus that lists title_texts but has no ts_embeddings (e.g. the
    embeddings file was never written) must serve like the classic engine:
    title path disabled, no crash (regression: ts_k was clamped only by
    len(title_texts), so the first serve() blew up in lax.top_k)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    index = synth_corpus(120, rng)
    assert index.ts_embeddings is not None
    index.ts_embeddings = None          # titles present, embeddings absent
    encoder = TextEncoder(preset="tiny-test", dtype=jnp.float32,
                          max_length=64)
    d = encoder.encode(["probe"]).shape[1]
    index.embeddings = normalize_rows(
        rng.normal(size=(120, d)).astype(np.float32))
    reranker = EncoderReranker(preset="tiny-test", passage_max_length=64)
    engine = EnsembleRetriever(index, encoder.encode, bm25=None, k=5,
                               encoder=encoder)
    fused = FusedServePath(index, reranker, encoder=encoder, k=5,
                           rerank_cap=10)
    assert fused.ts_k == 0
    for t in index.texts:
        reranker.tokenize_passage(t)
    full, chunks_o, scores_o, sel_o = oracle(
        engine, reranker, index, "revenue margin europe", [], cap=10)
    chunks_f, sel_f, diag = fused.serve("revenue margin europe", [],
                                        QUERY_TIME)
    assert [c["_row"] for c in chunks_f] == [c["_row"] for c in chunks_o]
    assert sel_f == sel_o


def test_faiss_k_zero_disables_dense_path():
    """faiss_k=0 (dense path compiled out, run_dense=False): the fused
    program must serve title+BM25 results identical to the classic engine,
    with expansion dead (it only applies to dense hits) and no width-0
    candidate-table gathers traced."""
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    n = 150
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
                               faiss_k=0, encoder=encoder)
    cap = 20
    fused = FusedServePath(index, reranker, encoder=encoder, bm25=bm25,
                           k=0, ts_k=5, bm25_k=5, rerank_cap=cap)
    assert fused.k == 0 and fused.ts_k > 0
    for t in index.texts:
        reranker.tokenize_passage(t)
    for query, hyde in [("revenue margin europe", ["battery capex cash"]),
                        ("tok3 tok7 battery", [])]:
        full, chunks_o, scores_o, sel_o = oracle(
            engine, reranker, index, query, hyde, cap)
        chunks_f, sel_f, diag = fused.serve(query, hyde, QUERY_TIME)
        assert [c["_row"] for c in chunks_f] == [c["_row"] for c in chunks_o]
        assert [c["retriever"] for c in chunks_f] == [
            c["retriever"] for c in chunks_o]
        assert all(c["retriever"] != "FAISS" for c in chunks_f)
        assert sel_f == sel_o


def test_long_query_negative_budget_grows_seq():
    """A query whose prefix alone exceeds the standard seq bucket
    (budget < 0, empty passage slices) must grow the bucket instead of
    truncating the prefix, matching the classic path's logits."""
    import jax.numpy as jnp

    rng = np.random.default_rng(8)
    index = synth_corpus(80, rng)
    encoder = TextEncoder(preset="tiny-test", dtype=jnp.float32,
                          max_length=64)
    d = encoder.encode(["probe"]).shape[1]
    index.embeddings = normalize_rows(
        rng.normal(size=(80, d)).astype(np.float32))
    index.ts_embeddings = normalize_rows(rng.normal(
        size=(index.ts_embeddings.shape[0], d)).astype(np.float32))
    # tiny passage budget, large query allowance -> prefix > seq bucket
    reranker = EncoderReranker(preset="tiny-test", passage_max_length=48,
                               query_max_length=160)
    engine = EnsembleRetriever(index, encoder.encode, bm25=None, k=5,
                               encoder=encoder)
    fused = FusedServePath(index, reranker, encoder=encoder, k=5,
                           rerank_cap=10)
    for t in index.texts:
        reranker.tokenize_passage(t)
    query = " ".join(f"metric{i} growth value" for i in range(60))
    full, chunks_o, scores_o, sel_o = oracle(
        engine, reranker, index, query, [], cap=10)
    chunks_f, sel_f, diag = fused.serve(query, [], QUERY_TIME)
    assert [c["_row"] for c in chunks_f] == [c["_row"] for c in chunks_o]
    np.testing.assert_allclose(diag["logits"][: len(chunks_o)], scores_o,
                               rtol=2e-4, atol=2e-4)
    assert sel_f == sel_o
