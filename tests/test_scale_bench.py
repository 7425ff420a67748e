"""Scale-bench machinery at toy row counts (the 10M artifact run happens
on real hardware; this pins the device-side corpus generation, the lazy
index, and both bench paths end to end)."""

import numpy as np

from veritasfi_tpu.evals import scale_bench


def test_device_corpus_normalized_blocks():
    import jax.numpy as jnp

    mat = scale_bench._device_corpus(1000, 64, jnp.bfloat16, seed=1)
    assert mat.shape == (1000, 64) and mat.dtype == jnp.bfloat16
    norms = np.linalg.norm(np.asarray(mat.astype(jnp.float32)), axis=1)
    # unit rows up to bf16 rounding; no zero rows anywhere (every row of
    # every block, including the overlapping final partial block, filled)
    np.testing.assert_allclose(norms, 1.0, atol=0.05)


def test_run_single_chip_small():
    r = scale_bench.run_single_chip(n=4096, dim=64, iters=2)
    assert r["corpus_rows"] == 4096
    assert r["invoke_p50_ms"] > 0
    assert r["dtype"] == "bfloat16"
    assert r["kernel"] == "xla_chunked_fallback"  # CPU suite


def test_run_single_chip_tripartite_keys():
    """The r05 protocol: interleaved dense/tripartite block medians, a
    BM25-leg decomposition with postings counts, and roofline numbers."""
    r = scale_bench.run_single_chip(n=4096, dim=64, iters=6, blocks=2,
                                    bm25=True)
    assert r["invoke_tripartite_p50_ms"] > 0
    assert len(r["invoke_tripartite_blocks_ms"]) == 2
    assert len(r["invoke_dense_blocks_ms"]) == 2
    leg = r["bm25"]["leg"]
    assert leg["p50_ms"] >= 0 and len(leg["per_query_ms"]) == 8
    assert all(p >= 0 for p in leg["postings_touched"])
    assert r["bm25"]["engine"] == "native_cpp_flat_csr"
    rf = r["roofline"]
    assert rf["transport_floor_ms"] >= 0
    assert rf["achieved_hbm_gbps"] > 0
    assert rf["pct_of_v5e_hbm_peak"] is None  # CPU suite


def test_scale_bm25_fixture_semantics():
    """Token-id fixture: stable query-term mapping, Zipf df ordering, and
    invoke contract (descending scores, ids in range)."""
    bm = scale_bench.build_scale_bm25(2000, avg_len=40)
    q = "battery margin outlook"
    ids1, ids2 = bm.query_ids(q), bm.query_ids(q)
    np.testing.assert_array_equal(ids1, ids2)
    rows, scores = bm.invoke(q, 10)
    assert len(rows) == 10 and (rows >= 0).all() and (rows < 2000).all()
    assert (np.diff(scores) <= 1e-6).all()
    assert bm.postings_touched(q) > 0
    # head (common) term ids have larger posting lists than deep-tail ids
    df_head = bm.native.df(0)
    df_tail = bm.native.df(60000)
    assert df_head > df_tail


def test_run_sharded_dryrun_small():
    r = scale_bench.run_sharded_dryrun(n=2048, dim=64)
    assert r["ok"] and r["shards"] == 8


def test_bf16_ab_small():
    """The interleaved A/B harness runs both arms over ONE shared corpus
    and reports per-round medians + a consistency verdict (the r3 bf16
    latency claim failed to reproduce; the artifact must only claim wins
    that hold in EVERY interleaved round)."""
    from veritasfi_tpu.evals.bf16_ab import run_ab

    r = run_ab(n=4096, dim=64, rounds=2, iters_per_block=2, kernel_reps=2)
    d = r["detail"]
    assert set(d["e2e_invoke_ms"]) == {"float32", "bfloat16"}
    for arm in d["e2e_invoke_ms"].values():
        assert len(arm["blocks"]) == 2
        assert arm["min_ms"] <= arm["median_of_medians_ms"] <= arm["max_ms"]
    assert isinstance(d["e2e_win_consistent_across_rounds"], bool)
