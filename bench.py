"""End-to-end retrieve+rerank latency benchmark (single chip).

Measures the designated hot path on real hardware: query+HyDE encoding ->
batched dense top-k (depth 2048) over a 10k-chunk corpus -> title-summary
path -> host BM25 -> fusion -> cross-encoder rerank (bge-reranker-base
shape, top candidates) -> similarity dedup + bundle-capped selection.

Default path: FusedServePath — encoder forward, multi-path search, the
fusion loop, rerank pair assembly, cross-encoder forward, and greedy
selection all inside ONE device program with ONE host readback (the
host<->TPU transport costs ~28 ms per readback, so readback count is the
latency budget). ``--classic`` runs the two-readback path for comparison.

Reference baseline: 4.0 s retrieve+rerank per sub-query on one GPU behind a
global reranker lock (BASELINE.md, stress_theory.js:5). Target: <50 ms p50
on one v5e chip (BASELINE.json north star).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import json
import statistics
import sys
import time

import numpy as np

REFERENCE_RETRIEVE_RERANK_MS = 4000.0

_T0 = time.perf_counter()


def _phase(msg: str) -> None:
    """Stage timestamps on stderr: when a driver run times out, the tail
    shows WHERE the budget went (the r03 artifact was rc:124 with zero
    evidence). stdout stays JSON-only."""
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def make_synth_corpus(n, rng):
    """Synthetic processed-corpus records (finance-flavored text)."""
    from veritasfi_tpu.ingest.contract import ChunkRecord, hash_content

    words = ["revenue", "margin", "delivery", "vehicles", "stores", "europe",
             "china", "quarter", "growth", "cash", "flow", "battery",
             "premium", "segment", "guidance", "capex"] + [
        f"tok{i}" for i in range(500)]
    records = []
    for i in range(n):
        body = " ".join(rng.choice(words, size=160))
        content = f"chunk {i}: {body}"
        records.append(ChunkRecord(
            content=content, filename=f"f{i % 40}.json",
            page_number=i % 300 + 1,
            date_published=f"202{i % 4}-0{i % 9 + 1}-15",
            doc_id=hash_content(content), global_id=i,
            bundle_id=f"b{i // 4}" if i % 16 < 4 else None,
            title_summary=f"Topic {i % 512}" if i % 2 == 0 else None,
        ))
    titles = sorted({r.title_summary for r in records if r.title_summary})
    return records, titles


def bench_1m_retrieval(iters: int = 10, n: int = 1_000_000, dim: int = 384,
                       bf16_engine: bool = False):
    """Large-corpus retrieval p50 (expansion on): the engine's streaming
    search path (chunked top-k + scores_at + rank_of, no [Q, N]
    materialization) over a 1M-row corpus — FAISS depth-2048 semantics at a
    scale where the naive rank broadcast would need ~1 GB of intermediates
    (BASELINE config #5 direction; single chip here, ICI-sharded variant in
    parallel/mesh.py)."""
    import time

    import numpy as np

    from veritasfi_tpu.ingest.corpus import CorpusIndex, normalize_rows
    from veritasfi_tpu.models.hash_embedder import HashEmbedder
    from veritasfi_tpu.retrieval.ensemble import EnsembleRetriever

    rng = np.random.default_rng(1)
    # arrays directly (1M ChunkRecord objects would dominate build time)
    prev = np.arange(-1, n - 1, dtype=np.int32)
    nxt = np.arange(1, n + 1, dtype=np.int32)
    prev[::5] = -1
    nxt[4::5] = -1
    nxt[-1] = -1
    num_titles = 4096
    title_code = np.where(np.arange(n) % 2 == 0,
                          np.arange(n) % num_titles, -1).astype(np.int32)
    from veritasfi_tpu.ingest.corpus import _csr_from_codes

    t_indptr, t_members = _csr_from_codes(title_code, num_titles)
    bundle_code = np.full(n, -1, np.int32)
    b_indptr, b_members = _csr_from_codes(bundle_code, 0)
    index = CorpusIndex(
        texts=[f"c{i}" for i in range(n)],
        doc_ids=[str(i) for i in range(n)],
        filenames=["f"] * n, page_numbers=[1] * n,
        dates=["2024-01-15"] * n,
        bundle_names=[], title_texts=[f"T{i}" for i in range(num_titles)],
        modalities=["text"] * n,
        global_id=np.arange(n, dtype=np.int32),
        date_days=np.full(n, 19738, np.int32),
        prev_idx=prev, next_idx=nxt,
        bundle_code=bundle_code, title_code=title_code,
        bundle_indptr=b_indptr, bundle_members=b_members,
        title_indptr=t_indptr, title_members=t_members,
        embeddings=normalize_rows(
            rng.standard_normal((n, dim), np.float32)),
        ts_embeddings=normalize_rows(
            rng.standard_normal((num_titles, dim), np.float32)),
    )
    emb = HashEmbedder(dim=dim)
    engine = EnsembleRetriever(index, emb.encode, bm25=None, k=10,
                               enable_expand=True, depth=2048)
    query = "quarterly revenue growth delivery guidance"
    hyde = ["revenue grew strongly in the quarter",
            "table of quarterly revenue by region",
            "cash flow and capex guidance improved"]
    engine.invoke(query, hyde)   # compile
    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        engine.invoke(query, hyde)
        lat.append((time.perf_counter() - t0) * 1000.0)
    lat.sort()

    # fused Pallas MIPS kernel vs XLA chunked at this scale (VERDICT r1 #8)
    import jax
    import jax.numpy as jnp

    from veritasfi_tpu.ops.pallas_mips import pallas_mips_topk
    from veritasfi_tpu.ops.topk import dense_topk_chunked

    c_dev = jnp.asarray(index.embeddings)
    c_bf = c_dev.astype(jnp.bfloat16)
    q_emb = jnp.asarray(emb.encode([query] + hyde))

    def med(fn, reps=7):
        fn()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append((time.perf_counter() - t0) * 1000.0)
        ts.sort()
        return ts[reps // 2]

    t_xla = med(lambda: jax.device_get(dense_topk_chunked(c_dev, q_emb, 16)))
    t_pl = med(lambda: jax.device_get(
        pallas_mips_topk(c_bf, q_emb.astype(jnp.bfloat16), 16)))

    del c_dev, c_bf
    out = {"corpus_size": n, "p50_ms": round(lat[len(lat) // 2], 3),
           "expansion": True, "path": "streaming",
           "topk_xla_chunked_f32_ms": round(t_xla, 2),
           "topk_pallas_bf16_ms": round(t_pl, 2)}
    # end-to-end invoke with the bf16-resident corpus (dense search through
    # the fused Pallas MIPS kernel, retrieval.corpus_dtype: bfloat16).
    # OPT-IN (--bf16-1m): this is a SECOND 1M engine build = a second
    # minutes-slow remote compile, which is what blew the r03 driver budget
    # (BENCH_r03 rc:124). bf16's primary value at 1M is HBM footprint
    # (enables 10M rows on one chip); its end-to-end latency delta is within
    # ambient relay-RTT noise — see BF16_AB_r04.json for interleaved A/B
    # medians rather than a single-run claim here.
    if bf16_engine:
        try:
            engine_bf = EnsembleRetriever(index, emb.encode, bm25=None, k=10,
                                          enable_expand=True, depth=2048,
                                          corpus_dtype="bfloat16")
            engine_bf.invoke(query, hyde)   # compile
            lat_bf = []
            for _ in range(iters):
                t0 = time.perf_counter()
                engine_bf.invoke(query, hyde)
                lat_bf.append((time.perf_counter() - t0) * 1000.0)
            lat_bf.sort()
            out["p50_ms_bf16_pallas"] = round(lat_bf[len(lat_bf) // 2], 3)
        except Exception as e:   # never cost the headline metric this row
            out["p50_ms_bf16_pallas"] = f"failed: {e}"
    return out


def main():
    t_start = time.perf_counter()
    parser = argparse.ArgumentParser()
    parser.add_argument("--corpus-size", type=int, default=10_000)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument("--rerank-pairs", type=int, default=50,
                        help="cap on reranked candidates (BASELINE config #3:"
                             " bge-reranker-base scoring top-50 per query);"
                             " 0 = rerank everything retrieval returns")
    parser.add_argument("--seq", type=int, default=256)
    parser.add_argument("--concurrency", type=int, default=16,
                        help="wave size for the QPS measurement (sweep on "
                             "v5e: ~46 QPS at B=8, ~49.5 at B=12-16 — the "
                             "ceiling is the ~19 ms/request device compute)")
    parser.add_argument("--qps-queries", type=int, default=48)
    parser.add_argument("--skip-qps", action="store_true")
    parser.add_argument("--skip-1m", action="store_true",
                        help="skip the 1M-row streaming retrieval row")
    parser.add_argument("--budget-s", type=float, default=240.0,
                        help="wall-clock gate for the optional 1M-row "
                             "section: it only starts if the headline "
                             "measurements finished within this many "
                             "seconds (the headline JSON line is printed "
                             "and flushed FIRST either way, so a driver "
                             "timeout can never erase the round's perf "
                             "evidence — the r03 failure mode)")
    parser.add_argument("--bf16-1m", action="store_true",
                        help="also build the bf16-resident 1M engine "
                             "(a SECOND minutes-slow remote compile; "
                             "opt-in since it blew the r03 driver budget)")
    parser.add_argument("--int8-rerank", action="store_true",
                        help="run the reranker MLP on the fused int8 Pallas "
                             "path (models/encoder_reranker.py::quantize_mlp"
                             "). Wins ~2 ms standalone but LOSES ~5 ms/req "
                             "inside the serve program on this relay "
                             "(measured r2) — off by default")
    parser.add_argument("--attn", default="pallas",
                        choices=["xla", "pallas"],
                        help="reranker attention kernel: pallas = the "
                             "VMEM-resident short-seq MHA "
                             "(ops/pallas_attention.py). Default: measured "
                             "-4.4 ms p50 inside the serve program "
                             "(46.0 vs 50.4, p90 47.0 vs 53.4, r3) — "
                             "unlike the int8 MLP custom call it does not "
                             "defeat whole-program scheduling")
    parser.add_argument("--enc-attn", default="xla",
                        choices=["xla", "pallas"],
                        help="query-encoder attention kernel (separate "
                             "from --attn: the [4, 256] encoder shapes "
                             "are too small for the Pallas MHA to pay)")
    parser.add_argument("--qkv", default="split",
                        choices=["split", "fused"],
                        help="qkv projection layout: fused = one "
                             "[hidden, 3*hidden] GEMM per layer")
    parser.add_argument("--classic", action="store_true",
                        help="use the two-readback path (host fusion between "
                             "search and rerank) instead of FusedServePath")
    parser.add_argument("--trace", default=None,
                        help="capture a jax.profiler trace of one query "
                             "into this directory")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from veritasfi_tpu.ingest.corpus import build_corpus_index, normalize_rows
    from veritasfi_tpu.models.encoder import TextEncoder
    from veritasfi_tpu.models.encoder_reranker import EncoderReranker
    from veritasfi_tpu.rerank.fusion import (chunk_time_scores, rank_chunk,
                                             select_content)
    from veritasfi_tpu.retrieval.bm25 import BM25Index
    from veritasfi_tpu.retrieval.ensemble import EnsembleRetriever

    _phase("start: corpus synth")
    rng = np.random.default_rng(0)
    records, titles = make_synth_corpus(args.corpus_size, rng)

    # corpus embeddings: random normalized rows (the bulk-embed ingest job is
    # offline; query-time latency is what we measure)
    dim = 384  # bge-small embedding dim (BASELINE config #1)
    index = build_corpus_index(records, titles, embed_fn=None)
    index.embeddings = normalize_rows(
        rng.normal(size=(index.num_chunks, dim)).astype(np.float32))
    index.ts_embeddings = normalize_rows(
        rng.normal(size=(len(titles), dim)).astype(np.float32))
    _phase("corpus built; building BM25")
    bm25 = BM25Index.build(index.texts, index.doc_ids)

    import dataclasses

    from veritasfi_tpu.models.encoder import ENCODER_PRESETS
    from veritasfi_tpu.models.encoder_reranker import (
        RERANKER_ENCODER_PRESETS)

    # serving-perf arch: tanh gelu (erf costs ~5 ms/fwd on this TPU; the
    # delta is below bf16 rounding — models/encoder.py gelu_impl note)
    enc_arch = dataclasses.replace(ENCODER_PRESETS["bge-small-en"],
                                   gelu_impl="tanh", attn_impl=args.enc_attn,
                                   qkv_impl=args.qkv)
    rr_arch = dataclasses.replace(
        RERANKER_ENCODER_PRESETS["bge-reranker-base"], gelu_impl="tanh",
        attn_impl=args.attn, qkv_impl=args.qkv)

    # init on host CPU, ship each tree in ONE transfer: eager flax init +
    # per-leaf bf16 casts on the relay-attached TPU are hundreds of
    # individual device ops (~2 min of the r03 bench's budget, measured);
    # bf16-resident weights halve weight HBM traffic and remove the
    # per-forward f32->bf16 cast of the 250k-row embedding table
    _phase("BM25 built; initializing models on host CPU")

    def _to_bf16(t):
        return t.astype(jnp.bfloat16) if t.dtype == jnp.float32 else t

    # flax init EXECUTES the forward, so init under attn_impl='xla' (the
    # Pallas kernel cannot lower on CPU; the param tree is identical) and
    # hand the params to the pallas-attn models
    tpu0 = jax.devices()[0]
    with jax.default_device(jax.devices("cpu")[0]):
        enc_init = TextEncoder(
            arch=dataclasses.replace(enc_arch, attn_impl="xla"),
            dtype=jnp.bfloat16, max_length=256)
        rr_init = EncoderReranker(
            arch=dataclasses.replace(rr_arch, attn_impl="xla"),
            dtype=jnp.bfloat16, passage_max_length=args.seq)
        enc_bf = jax.tree.map(_to_bf16, enc_init.params)
        rr_bf = jax.tree.map(_to_bf16, rr_init.params)
    _phase("models initialized; transferring params to TPU")
    encoder = TextEncoder(arch=enc_arch, dtype=jnp.bfloat16, max_length=256,
                          params=jax.device_put(enc_bf, tpu0))
    reranker = EncoderReranker(arch=rr_arch, dtype=jnp.bfloat16,
                               passage_max_length=args.seq,
                               params=jax.device_put(rr_bf, tpu0))
    del enc_init, rr_init, enc_bf, rr_bf
    _phase("params resident on TPU")

    engine = EnsembleRetriever(index, encoder.encode, bm25=bm25, k=10,
                               enable_expand=True, depth=2048,
                               encoder=encoder)

    # fused int8 MLP rerank forward (both GEMMs at the MXU's int8 rate,
    # intermediate activation VMEM-resident); opt-in — see --int8-rerank
    if args.int8_rerank:
        reranker.quantize_mlp()

    # native C++ BM25 for the serve path's host leg when built (identical
    # scores; tests/test_native_bm25.py)
    serve_bm25 = bm25
    try:
        from veritasfi_tpu.native.bm25_native import (NativeBM25,
                                                      native_available)

        if native_available():
            serve_bm25 = NativeBM25(index.texts, index.doc_ids)
    except Exception:
        pass

    query = "What was the quarterly revenue growth and delivery guidance?"
    hyde = [
        "Revenue grew strongly in the quarter driven by premium segment "
        "deliveries across china and europe with improved margin guidance.",
        "[Table Level] Table Title: quarterly revenue. Row 1: Q1 revenue "
        "growth. Row 2: delivery volumes by region and segment.",
        "Cash flow and capex guidance improved with battery cost declines "
        "and store expansion across europe markets.",
    ]

    # pre-tokenize corpus passages (static text; done once at index load)
    _phase("pre-tokenizing corpus passages")
    for text in index.texts:
        reranker.tokenize_passage(text)
    _phase("passages tokenized")

    fused = None
    if not args.classic:
        from veritasfi_tpu.retrieval.fused_serve import FusedServePath

        # --rerank-pairs 0 means "rerank everything retrieval returns";
        # the fused program needs a STATIC cap, so use a generous bound
        # (dense hits x expansion factor + title + bm25) instead of
        # silently capping at 50 — candidates past it are cut mid-group
        # exactly like the classic path's chunks[:cap]
        cap = args.rerank_pairs or (10 * (1 + len(hyde)) * 4 + 10 + 10)
        fused = FusedServePath(
            index, reranker, encoder=encoder, bm25=serve_bm25, k=10,
            enable_expand=True, depth=2048,
            rerank_cap=cap, chunk_topk=5)

    def one_query(q, hy):
        if fused is not None:
            chunks, sel, _ = fused.serve(q, hy, "2024-06-01")
            content, times, selected = select_content(chunks, sel)
            return len(chunks), len(selected)
        chunks = engine.invoke(q, hy)
        if args.rerank_pairs:
            chunks = chunks[: args.rerank_pairs]
        rows = reranker.encode_pairs_cached(
            q, [c["page_content"] for c in chunks])
        emb = index.embeddings[[c["_row"] for c in chunks]]
        scores, sim = reranker.score_and_sim(rows, emb)
        tscores = chunk_time_scores(chunks, "2024-06-01")
        sel = rank_chunk(chunks, scores, tscores, sim, chunk_topk=5)
        content, times, selected = select_content(chunks, sel)
        return len(chunks), len(selected)

    # warmup (compiles)
    _phase("warmup/compile of the serve program")
    for _ in range(args.warmup):
        one_query(query, hyde)
    _phase("warmup done; measuring p50")

    if args.trace:
        from veritasfi_tpu.utils.profiler import profiler as _prof

        with _prof.device_trace(args.trace):
            one_query(query, hyde)

    latencies = []
    n_chunks = n_sel = 0
    for i in range(args.iters):
        t0 = time.perf_counter()
        n_chunks, n_sel = one_query(query, hyde)
        latencies.append((time.perf_counter() - t0) * 1000.0)

    # sustained QPS: micro-batch B concurrent requests into ONE fused search
    # dispatch and ONE rerank forward — the TPU serving shape (batch, don't
    # thread). The reference serializes every session on a reranker lock
    # (vllmChatService.py:88-90).
    qps = None
    if not args.skip_qps and fused is not None:
        # fused wave: enqueue B single-readback programs, ONE device_get
        # for the whole wave (dispatch is async; the transport round-trip
        # is paid once per wave, not per request)
        B = args.concurrency

        def run_wave():
            fused.serve_wave([(query, hyde, "2024-06-01")] * B)

        _phase("p50 measured; compiling QPS wave")
        run_wave()
        waves = max(args.qps_queries // B, 1)
        t0 = time.perf_counter()
        for _ in range(waves):
            run_wave()
        qps = waves * B / (time.perf_counter() - t0)
    elif not args.skip_qps:
        B = args.concurrency

        def run_wave():
            requests = [(query, hyde)] * B
            per_request = engine.invoke_batch(requests)
            rows, slices, emb_rows = [], [], []
            for chunks in per_request:
                if args.rerank_pairs:
                    chunks = chunks[: args.rerank_pairs]
                start = len(rows)
                rows.extend(reranker.encode_pairs_cached(
                    query, [c["page_content"] for c in chunks]))
                emb_rows.extend(c["_row"] for c in chunks)
                slices.append((start, len(rows), chunks))
            # ONE dispatch for all requests' rerank scores AND similarity
            # matrices (per-request sims are block diagonals of the full one
            # — 2B extra dispatches otherwise, each costing relay RTT)
            emb_all = index.embeddings[emb_rows]
            scores_all, sim_all = reranker.score_and_sim(rows, emb_all)
            for start, end, chunks in slices:
                scores = scores_all[start:end]
                sim = sim_all[start:end, start:end]
                tscores = chunk_time_scores(chunks, "2024-06-01")
                sel = rank_chunk(chunks, scores, tscores, sim, chunk_topk=5)
                select_content(chunks, sel)

        run_wave()  # compile the batched shapes
        waves = max(args.qps_queries // B, 1)
        t0 = time.perf_counter()
        for _ in range(waves):
            run_wave()
        qps = waves * B / (time.perf_counter() - t0)

    p50 = statistics.median(latencies)
    result = {
        "metric": "retrieve_rerank_p50",
        "value": round(p50, 3),
        "unit": "ms",
        "vs_baseline": round(REFERENCE_RETRIEVE_RERANK_MS / p50, 2),
        "detail": {
            "corpus_size": args.corpus_size,
            "device": str(jax.devices()[0]),
            "p90_ms": round(sorted(latencies)[int(0.9 * len(latencies))], 3),
            "mean_ms": round(statistics.mean(latencies), 3),
            "candidates": n_chunks,
            "selected": n_sel,
            "queries_per_batch": 1 + len(hyde),
            "int8_mlp_rerank": args.int8_rerank,
        },
    }
    if qps is not None:
        reference_qps = 1000.0 / REFERENCE_RETRIEVE_RERANK_MS
        result["detail"]["qps"] = round(qps, 2)
        result["detail"]["concurrency"] = args.concurrency
        result["detail"]["vs_baseline_qps"] = round(qps / reference_qps, 1)

    # Headline FIRST, flushed: if anything after this point runs long, the
    # round's perf evidence already exists on stdout (BENCH_r03 was rc:124
    # with zero output because the one print sat after the 1M sections).
    elapsed = time.perf_counter() - t_start
    result["detail"]["elapsed_headline_s"] = round(elapsed, 1)
    print(json.dumps(result), flush=True)

    # --- roofline: MXU utilization of the cross-encoder rerank forward ---
    # (VERDICT r4 #4: replace "speed of light" narrative with numbers).
    # AFTER the headline print: score_and_sim is a fresh executable in the
    # default fused mode, and a pre-headline remote compile is the exact
    # BENCH_r03 rc:124 failure mode. Candidates are the first `cap` corpus
    # passages — the forward's cost is set by [batch, bucket] shape, not by
    # which rows retrieval picked.
    def rerank_forward_flops(arch, batch, seq_len):
        # per layer: 8BLh^2 (q/k/v/o GEMMs) + 4BL^2h (scores + apply) +
        # 4BLh*i (both MLP GEMMs); multiply-add = 2 flops
        h, i = arch.hidden, arch.intermediate
        per_layer = (8 * batch * seq_len * h * h
                     + 4 * batch * seq_len * seq_len * h
                     + 4 * batch * seq_len * h * i)
        return arch.layers * per_layer

    # one floor protocol + one peak constant for every roofline artifact
    from veritasfi_tpu.evals.scale_bench import (V5E_BF16_PEAK_TFLOPS,
                                                 _transport_floor_ms as
                                                 transport_floor_ms)

    try:
        _phase("measuring rerank-forward roofline")
        cap = args.rerank_pairs or 50
        rows_rf = reranker.encode_pairs_cached(query, index.texts[:cap])
        emb_rf = index.embeddings[:cap]

        def rf():
            jax.block_until_ready(reranker.score_and_sim(rows_rf, emb_rf))

        rf()
        ts = []
        for _ in range(9):
            t0 = time.perf_counter()
            rf()
            ts.append((time.perf_counter() - t0) * 1000.0)
        wall = statistics.median(ts)
        floor = transport_floor_ms()
        dev_ms = max(wall - floor, 1e-3)
        # FLOPs the chip actually executes: the padded compile bucket
        # (score_and_sim pads to the next multiple of 64), not max row len
        seq_rf = max(len(r) for r in rows_rf)
        bucket_rf = max(-(-seq_rf // 64) * 64, 64)
        flops = rerank_forward_flops(rr_arch, len(rows_rf), bucket_rf)
        tflops = flops / 1e12 / (dev_ms / 1e3)
        on_tpu = jax.default_backend() == "tpu"
        result["detail"]["rerank_roofline"] = {
            "rerank_batch": len(rows_rf),
            "rerank_seq_bucket": bucket_rf,
            "forward_wall_p50_ms": round(wall, 2),
            "transport_floor_ms": round(floor, 2),
            "forward_device_ms": round(dev_ms, 2),
            "forward_tflop": round(flops / 1e12, 3),
            "achieved_tflops": round(tflops, 1),
            "mxu_utilization_pct_v5e_bf16": (
                round(100.0 * tflops / V5E_BF16_PEAK_TFLOPS, 1)
                if on_tpu else None),
        }
        print(json.dumps(result), flush=True)
    except Exception as e:   # roofline must never cost the headline
        result["detail"]["rerank_roofline"] = {"failed": str(e)}

    # Optional 1M-row section, wall-clock gated; on success reprint the
    # augmented result (the driver parses the LAST JSON line in the tail).
    if not args.skip_1m and elapsed < args.budget_s:
        result["detail"]["corpus_1m"] = bench_1m_retrieval(
            bf16_engine=args.bf16_1m)
        result["detail"]["elapsed_total_s"] = round(
            time.perf_counter() - t_start, 1)
        print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
