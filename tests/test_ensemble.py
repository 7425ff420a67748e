"""Ensemble engine: unit behavior + randomized parity vs the reference
oracle (literal simulation of ensembleRetriever.py semantics)."""

import json

import numpy as np
import pytest

from reference_oracle import oracle_ensemble_invoke
from veritasfi_tpu.ingest.contract import load_processed_dir
from veritasfi_tpu.ingest.corpus import build_corpus_index
from veritasfi_tpu.models.hash_embedder import HashEmbedder
from veritasfi_tpu.retrieval.bm25 import BM25Index
from veritasfi_tpu.retrieval.ensemble import EnsembleRetriever

EMB = HashEmbedder(dim=96)


def make_corpus(tmp_path, num_files=3, chunks_per_file=30, seed=0,
                bundle_frac=0.3, title_frac=0.5):
    """Randomized synthetic corpus with bundles, titles, shared vocab."""
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(40)] + ["zeekr", "revenue", "stores",
                                            "margin", "delivery", "europe"]
    d = tmp_path / f"c{seed}"
    d.mkdir()
    for f in range(num_files):
        rows = [{"start": 1, "end": 10_000,
                 "date_published": f"202{f % 3}-0{f % 9 + 1}-15"}]
        for c in range(chunks_per_file):
            content = " ".join(rng.choice(words, size=12))
            row = {"content": f"f{f}c{c} " + content, "page_number": c + 1}
            if rng.random() < bundle_frac:
                row["bundle_id"] = f"b{f}-{int(rng.integers(0, 5))}"
            if rng.random() < title_frac:
                row["title_summary"] = f"Topic {int(rng.integers(0, 8))}"
            rows.append(row)
        (d / f"file{f}.json").write_text(json.dumps(rows))
    records, titles = load_processed_dir(str(d))
    idx = build_corpus_index(records, titles, embed_fn=EMB.encode)
    bm25 = BM25Index.build(idx.texts, idx.doc_ids)
    return idx, bm25


def strip_rows(chunks):
    return [{k: v for k, v in c.items() if k != "_row"} for c in chunks]


def engine_search_results(eng, idx, q, hyde):
    """Full-depth search outputs from the engine's own jitted search path,
    fed to the oracle so it ranks with identical arithmetic (isolates
    fusion semantics from batch-shape matmul ulps; SURVEY.md §7.3)."""
    import jax.numpy as jnp

    from veritasfi_tpu.ingest.corpus import normalize_rows

    qe = normalize_rows(EMB.encode([q] + hyde))
    s, i = eng.dense.search(jnp.asarray(qe), idx.num_chunks)
    dense_results = [(np.asarray(i)[r], np.asarray(s)[r]) for r in range(len(qe))]
    tq = normalize_rows(EMB.encode([q]))
    ts_s, ts_i = eng.ts_dense.search(jnp.asarray(tq), len(idx.title_texts))
    return dense_results, (np.asarray(ts_i)[0], np.asarray(ts_s)[0])


def assert_parity(ours, oracle):
    assert len(ours) == len(oracle), (len(ours), len(oracle))
    for a, b in zip(strip_rows(ours), oracle):
        assert a["retriever"] == b["retriever"]
        assert a["page_content"] == b["page_content"]
        assert a["metadata"] == b["metadata"]
        assert a["bundle_id"] == b["bundle_id"]
        assert abs(a["score"] - b["score"]) < 1e-4, (a["score"], b["score"])


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("expand", [False, True])
def test_parity_with_reference_oracle(tmp_path, seed, expand):
    idx, bm25 = make_corpus(tmp_path, seed=seed)
    eng = EnsembleRetriever(idx, EMB.encode, bm25=bm25, k=8,
                            enable_expand=expand)
    rng = np.random.default_rng(seed + 100)
    queries = [
        "zeekr revenue margin",
        "stores europe delivery",
        " ".join(rng.choice([f"w{i}" for i in range(40)], size=6)),
    ]
    for q in queries:
        hyde = [f"hypothetical answer about {q}", f"table of {q}"]
        dense_results, ts_result = engine_search_results(eng, idx, q, hyde)
        ours = eng.invoke(q, hyde)
        oracle = oracle_ensemble_invoke(
            idx.embeddings, idx.ts_embeddings,
            [idx.metadata(i) for i in range(idx.num_chunks)],
            idx.texts, idx.title_texts,
            bm25_scores_fn=lambda t: bm25.get_scores(t),
            embed_fn=EMB.encode,
            input_text=q, hyde_chunks=hyde,
            faiss_k=8, bm25_k=8, faiss_ts_k=8,
            enable_expand=expand,
            dense_results=dense_results, ts_result=ts_result,
        )
        assert_parity(ours, oracle)


def test_parity_random_knob_combinations(tmp_path):
    """Oracle parity under RANDOM (faiss_k, bm25_k, ts_k, expand, depth)
    combinations — the fixed-seed tests above never vary the k's, so the
    compiled-out-path widths (ts_k=0) and shallow depth cutoffs are
    exercised here; invoke_batch must match invoke for each."""
    rng = np.random.default_rng(424)
    for t in range(6):
        seed = int(rng.integers(0, 10_000))
        k = int(rng.integers(1, 12))
        bm25_k = int(rng.integers(0, 10))
        ts_k = int(rng.integers(0, 10))
        expand = bool(rng.integers(0, 2))
        depth = int(rng.choice([10, 50, 2048]))
        d = tmp_path / f"c{t}"
        d.mkdir()
        idx, bm25 = make_corpus(d, seed=seed)
        eng = EnsembleRetriever(idx, EMB.encode, bm25=bm25, k=8,
                                faiss_k=k, bm25_k=bm25_k, faiss_ts_k=ts_k,
                                enable_expand=expand, depth=depth)
        q = " ".join(rng.choice(
            ["zeekr", "revenue", "margin", "stores", "europe", "delivery"]
            + [f"w{i}" for i in range(40)], size=6))
        hyde = ([f"hypothetical answer about {q}"]
                if rng.integers(0, 2) else [])
        dense_results, ts_result = engine_search_results(eng, idx, q, hyde)
        ours = eng.invoke(q, hyde)
        oracle = oracle_ensemble_invoke(
            idx.embeddings, idx.ts_embeddings,
            [idx.metadata(i) for i in range(idx.num_chunks)],
            idx.texts, idx.title_texts,
            bm25_scores_fn=lambda t: bm25.get_scores(t),
            embed_fn=EMB.encode, input_text=q, hyde_chunks=hyde,
            faiss_k=k, bm25_k=bm25_k, faiss_ts_k=ts_k,
            enable_expand=expand, depth=depth,
            dense_results=dense_results, ts_result=ts_result)
        assert_parity(ours, oracle)
        batched = eng.invoke_batch([(q, hyde)])
        assert [strip_rows(r) for r in batched] == [strip_rows(ours)]


def test_expansion_triggers(tmp_path):
    """With a query equal to a chunk's text (score 1.0 > 0.72), expansion
    pulls prev/next chunks whose scores pass 0.66."""
    idx, bm25 = make_corpus(tmp_path, seed=7, bundle_frac=0.0, title_frac=0.0)
    eng = EnsembleRetriever(idx, EMB.encode, bm25=bm25, k=0, faiss_k=1,
                            enable_expand=True)
    # craft query = one chunk's text -> self-score 1.0
    target_row = 5
    ours = eng.invoke(idx.texts[target_row], [])
    rows = [c["_row"] for c in ours]
    assert target_row in rows
    assert ours[0]["retriever"] == "FAISS"
    # all emitted chunks share bundle_id 0 (single output bundle)
    assert all(c["bundle_id"] == 0 for c in ours)


def test_path_gating(tmp_path):
    idx, bm25 = make_corpus(tmp_path, seed=4)
    eng = EnsembleRetriever(idx, EMB.encode, bm25=bm25, k=0, bm25_k=5)
    out = eng.invoke("zeekr revenue", [])
    assert out and all(c["retriever"] == "BM25" for c in out)

    eng2 = EnsembleRetriever(idx, EMB.encode, bm25=bm25, k=0, faiss_ts_k=3)
    out2 = eng2.invoke("zeekr revenue", [])
    assert out2 and all(c["retriever"] == "Title Summary" for c in out2)


def test_seen_dedup_across_paths(tmp_path):
    idx, bm25 = make_corpus(tmp_path, seed=5)
    eng = EnsembleRetriever(idx, EMB.encode, bm25=bm25, k=10)
    out = eng.invoke("zeekr revenue stores", [])
    rows = [c["_row"] for c in out]
    assert len(rows) == len(set(rows))  # dedup-union across all paths


def test_similarity_mtx_rows_matches_text(tmp_path):
    idx, bm25 = make_corpus(tmp_path, seed=6)
    eng = EnsembleRetriever(idx, EMB.encode, bm25=bm25, k=5)
    rows = [0, 3, 7]
    a = eng.compute_similarity_mtx_rows(rows)
    b = eng.compute_similarity_mtx([idx.texts[r] for r in rows])
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_streaming_search_body_matches_dense(tmp_path):
    """_search_body_streaming (large-corpus path: chunked top-k + scores_at
    + rank_of) must be bit-identical to _search_body."""
    import jax
    import jax.numpy as jnp

    from veritasfi_tpu.ingest.corpus import normalize_rows
    from veritasfi_tpu.retrieval.ensemble import (_search_body,
                                                  _search_body_streaming)

    rng = np.random.default_rng(5)
    n, d, q = 500, 32, 3
    corpus = jnp.asarray(normalize_rows(rng.normal(size=(n, d))))
    ts = jnp.asarray(normalize_rows(rng.normal(size=(17, d))))
    qe = jnp.asarray(normalize_rows(rng.normal(size=(q, d))))
    prev = jnp.asarray(
        np.where(np.arange(n) % 7 == 0, -1, np.arange(n) - 1).astype(np.int32))
    nxt = jnp.asarray(
        np.where(np.arange(n) % 5 == 0, -1, (np.arange(n) + 1) % n).astype(
            np.int32))
    for expand in (True, False):
        a = jax.device_get(_search_body(
            corpus, ts, qe, prev, nxt, 8, 4, 3, 100, expand))
        b = jax.device_get(_search_body_streaming(
            corpus, ts, qe, prev, nxt, 8, 4, 3, 100, expand, block=128))
        for x, y, name in zip(a, b, ["top_s", "top_i", "ts_s", "ts_i",
                                     "cand", "eff"]):
            np.testing.assert_allclose(x, y, rtol=1e-6, atol=1e-6,
                                       err_msg=name)
