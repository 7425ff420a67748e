"""Server-level stress: requests through the aiohttp front, not engine calls.

The reference's serving bottleneck is the global reranker lock — every
session's retrieve->rerank serializes on one GPU (reference:
src/utils/vllmChatService.py:88-90); its measured retrieve+rerank step is
4.0 s (stress_theory.js:5), i.e. 0.25 QPS. This harness drives the real
HTTP server (POST /v1/chat/async) at a given concurrency with a FakeLLM
backend, so the measured number is the serving stack itself: session
management, memory bank, wave-batched fused retrieval+rerank, and answer
orchestration — everything but the external chat LLM.

Run (writes a JSON artifact):
    python -m veritasfi_tpu.evals.server_stress --corpus-size 10000 \
        --concurrency 8 --requests 64 --out SERVER_STRESS.json
"""

from __future__ import annotations

import argparse
import asyncio
import json
import statistics
import time
from typing import List, Optional

REFERENCE_RETRIEVE_RERANK_S = 4.0   # stress_theory.js:5


def build_test_stack(corpus_size: int, seed: int = 0,
                     session_timeout_s: int = 1800):
    """Synthetic-corpus stack: random-weight bge-small encoder +
    bge-reranker-base, FakeLLM, fused serve path on."""
    import numpy as np

    from ..config import Config
    from ..ingest.corpus import build_corpus_index, normalize_rows
    from ..models.encoder import TextEncoder
    from ..models.encoder_reranker import EncoderReranker
    from ..retrieval.bm25 import BM25Index
    from ..stack import build_stack

    import jax.numpy as jnp

    try:
        from bench import make_synth_corpus  # repo-root bench fixtures
    except ImportError:
        import os
        import sys

        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))))
        from bench import make_synth_corpus

    rng = np.random.default_rng(seed)
    records, titles = make_synth_corpus(corpus_size, rng)
    index = build_corpus_index(records, titles, embed_fn=None)
    dim = 384
    index.embeddings = normalize_rows(
        rng.normal(size=(index.num_chunks, dim)).astype(np.float32))
    index.ts_embeddings = normalize_rows(
        rng.normal(size=(len(titles), dim)).astype(np.float32))
    bm25 = BM25Index.build(index.texts, index.doc_ids)

    import dataclasses

    import jax

    from ..models.encoder import ENCODER_PRESETS
    from ..models.encoder_reranker import RERANKER_ENCODER_PRESETS

    # serving-perf arch (same as bench.py): tanh gelu + bf16-resident params
    enc_arch = dataclasses.replace(ENCODER_PRESETS["bge-small-en"],
                                   gelu_impl="tanh")
    rr_arch = dataclasses.replace(
        RERANKER_ENCODER_PRESETS["bge-reranker-base"], gelu_impl="tanh")
    encoder = TextEncoder(arch=enc_arch, dtype=jnp.bfloat16, max_length=256)
    reranker = EncoderReranker(arch=rr_arch, dtype=jnp.bfloat16,
                               passage_max_length=256)

    def _to_bf16(t):
        return t.astype(jnp.bfloat16) if t.dtype == jnp.float32 else t

    encoder.params = jax.tree.map(_to_bf16, encoder.params)
    reranker.params = jax.tree.map(_to_bf16, reranker.params)

    from ..serving.llm_client import FakeLLM, ProtocolResponder

    config = Config()
    config.rerank.max_candidates = 50
    config.llm.base_url = ""
    config.serving.session_timeout_s = session_timeout_s
    # protocol-faithful offline LLM so the FULL RAG path runs (rewrite ->
    # retrieve -> rerank -> answer); without it need_rag=False short-circuits
    stack = build_stack(config, collections={}, embed_fn=encoder.encode,
                        reranker=reranker, llm=FakeLLM(ProtocolResponder()))
    stack.engine.register_collection("stress", index, bm25)
    retriever = stack.engine.create_retriever(10, "stress",
                                              enable_expand=True)
    stack.chat_service.retrievers = [retriever]

    # wire the fused path over the synthetic collection
    from ..retrieval.fused_serve import FusedServePath
    from ..serving.retrieval_batcher import RetrievalBatcher

    serve_bm25 = bm25
    try:
        from ..native.bm25_native import NativeBM25, native_available

        if native_available():
            serve_bm25 = NativeBM25(index.texts, index.doc_ids)
    except Exception:
        pass
    serve_path = FusedServePath(
        index, reranker, encoder=encoder, bm25=serve_bm25,
        k=10, enable_expand=True, depth=2048, rerank_cap=50, chunk_topk=5)
    batcher = RetrievalBatcher(serve_path, max_batch=16, max_wait_ms=3.0)
    stack.chat_service.retrieval_batcher = batcher
    stack.retrieval_batcher = batcher
    return stack


async def run_stress(port: int, concurrency: int, total: int) -> dict:
    import aiohttp

    url = f"http://127.0.0.1:{port}/v1/chat/async"
    payload = {"question": "What was the quarterly revenue growth and "
                           "delivery guidance?"}
    latencies: List[float] = []

    # the first request triggers the LAZY remote compile of the fused serve
    # program — minutes-slow on a cold relay; aiohttp's 300 s default total
    # timeout kills the run right there
    timeout = aiohttp.ClientTimeout(total=1800)
    async with aiohttp.ClientSession(timeout=timeout) as session:

        async def one(session_slot: int, record: bool) -> None:
            body = dict(payload, session_id=f"s{session_slot}")
            t0 = time.perf_counter()
            async with session.post(url, json=body) as resp:
                if resp.status != 200:    # not assert: -O must not hide it
                    raise RuntimeError(
                        f"HTTP {resp.status}: {await resp.text()}")
                await resp.json()
            if record:
                latencies.append((time.perf_counter() - t0) * 1000.0)

        # warm EVERY session slot (cold session creation inside the timed
        # window would inflate early latencies)
        await asyncio.gather(*(one(s, False) for s in range(concurrency)))
        t0 = time.perf_counter()
        # one session per semaphore SLOT: two concurrently in-flight
        # requests must never share a session, or they serialize on the
        # server's per-session lock and distort the measurement
        slot_queue: "asyncio.Queue" = asyncio.Queue()
        for s in range(concurrency):
            slot_queue.put_nowait(s)

        async def bounded(i: int) -> None:
            s = await slot_queue.get()
            try:
                await one(s, True)
            finally:
                slot_queue.put_nowait(s)

        await asyncio.gather(*(bounded(i) for i in range(total)))
        wall = time.perf_counter() - t0

    qps = total / wall
    return {
        "metric": "server_qps",
        "value": round(qps, 2),
        "unit": "req/s",
        "vs_baseline": round(qps * REFERENCE_RETRIEVE_RERANK_S, 1),
        "detail": {
            "endpoint": "/v1/chat/async",
            "concurrency": concurrency,
            "requests": total,
            "p50_ms": round(statistics.median(latencies), 1),
            # nearest-rank: int(0.9*n) degenerates to the max for small n
            "p90_ms": round(sorted(latencies)[
                max(0, -(-9 * len(latencies) // 10) - 1)], 1),
            "wall_s": round(wall, 2),
        },
    }


def _rss_mb() -> float:
    with open("/proc/self/statm") as f:
        pages = int(f.read().split()[1])
    import os

    return pages * os.sysconf("SC_PAGE_SIZE") / 1e6


def _pcts(xs: List[float]) -> dict:
    xs = sorted(xs)
    n = len(xs)
    # nearest-rank (int(q*n) degenerates to max for small n)
    pick = lambda q: xs[max(0, -(-int(q * 10 * n) // 10) - 1)] if n else 0.0
    return {"p50_ms": round(pick(0.5), 1), "p90_ms": round(pick(0.9), 1),
            "p99_ms": round(pick(0.99), 1), "n": n}


async def run_soak(port: int, concurrency: int, seconds: float,
                   churn: int, bucket_s: float = 10.0,
                   trace_malloc: bool = False) -> dict:
    """Sustained fixed-concurrency soak with the reference's query mix
    (80% 1 sub-question / 15% 2 / 5% 3 — stress_theory.js:12-15), session
    churn every ``churn`` requests per slot (exercises creation + the
    1800 s GC sweep), and time-bucketed latency so drift is visible."""
    import random

    import aiohttp

    url = f"http://127.0.0.1:{port}/v1/chat/async"
    subq = ["What was the quarterly revenue growth?",
            "What is the delivery guidance for next year?",
            "How did gross margin develop in Europe?"]
    rng = random.Random(7)
    samples: List[tuple] = []    # (t_rel, latency_ms, n_subs)
    rss: List[tuple] = []
    epoch = [0] * concurrency    # per-slot churn counter
    served = [0] * concurrency

    # warmup triggers the lazy remote compile (minutes on a cold relay);
    # the 300 s aiohttp default total timeout kills the soak right there
    timeout = aiohttp.ClientTimeout(total=1800)
    async with aiohttp.ClientSession(timeout=timeout) as session:

        async def one(slot: int, record: bool) -> None:
            n = rng.choices((1, 2, 3), weights=(80, 15, 5))[0]
            q = " ||| ".join(subq[:n])
            body = {"question": q,
                    "session_id": f"soak-{slot}-{epoch[slot]}"}
            t0 = time.perf_counter()
            async with session.post(url, json=body) as resp:
                if resp.status != 200:
                    raise RuntimeError(
                        f"HTTP {resp.status}: {await resp.text()}")
                await resp.json()
            if record:
                samples.append((time.perf_counter() - start,
                                (time.perf_counter() - t0) * 1000.0, n))
            served[slot] += 1
            if served[slot] % churn == 0:
                epoch[slot] += 1     # next request opens a NEW session

        await asyncio.gather(*(one(s, False) for s in range(concurrency)))
        start = time.perf_counter()

        async def worker(slot: int) -> None:
            while time.perf_counter() - start < seconds:
                await one(slot, True)

        # tracemalloc diff between mid-run and end separates a real
        # per-request retention (top stats grow linearly) from allocator /
        # arena fragmentation (python-level sizes flat while RSS climbs)
        snap_mid = None

        async def tracer() -> None:
            nonlocal snap_mid
            import tracemalloc

            tracemalloc.start(10)
            await asyncio.sleep(seconds / 2)
            snap_mid = tracemalloc.take_snapshot()

        async def rss_sampler() -> None:
            # sample live-session count alongside RSS: session state (chat
            # history + rag_info) is the expected post-fix growth source,
            # reclaimed by the GC sweep — the two series must move together
            health = f"http://127.0.0.1:{port}/v1/health"
            while time.perf_counter() - start < seconds:
                async with session.get(health) as resp:
                    live = (await resp.json())["sessions"]
                rss.append((round(time.perf_counter() - start, 1),
                            round(_rss_mb(), 1), live))
                await asyncio.sleep(bucket_s / 2)

        tasks = [rss_sampler()] + [worker(s) for s in range(concurrency)]
        if trace_malloc:
            tasks.append(tracer())
        await asyncio.gather(*tasks)
        wall = time.perf_counter() - start

    malloc_top = None
    if trace_malloc and snap_mid is not None:
        import tracemalloc

        snap_end = tracemalloc.take_snapshot()
        filt = (tracemalloc.Filter(False, tracemalloc.__file__),)
        growth = snap_end.filter_traces(filt).compare_to(
            snap_mid.filter_traces(filt), "lineno")
        malloc_top = [{"where": str(g.traceback[0]),
                       "growth_kb": round(g.size_diff / 1024, 1),
                       "count_diff": g.count_diff}
                      for g in growth[:12]]
        py_total_mb = sum(s.size for s in snap_end.statistics("filename"))
        malloc_top.append({"where": "TOTAL python-tracked",
                           "growth_kb": round(sum(
                               g.size_diff for g in growth) / 1024, 1),
                           "total_mb": round(py_total_mb / 1e6, 1)})
        tracemalloc.stop()

    lat = [l for _, l, _ in samples]
    buckets = []
    b = 0.0
    while b < wall:
        xs = [l for t, l, _ in samples if b <= t < b + bucket_s]
        if xs:
            buckets.append({"t_s": round(b, 1), **_pcts(xs)})
        b += bucket_s
    by_subs = {n: _pcts([l for _, l, k in samples if k == n])
               for n in (1, 2, 3)}
    sessions = sum(e + 1 for e in epoch)
    return {
        "metric": "server_soak_qps",
        "value": round(len(samples) / wall, 2),
        "unit": "req/s",
        "vs_baseline": round(len(samples) / wall
                             * REFERENCE_RETRIEVE_RERANK_S, 1),
        "detail": {
            "endpoint": "/v1/chat/async",
            "concurrency": concurrency,
            "duration_s": round(wall, 1),
            "requests": len(samples),
            "mix": "80/15/5 x 1/2/3 sub-questions (stress_theory.js:12-15)",
            "sessions_created": sessions,
            "churn_every": churn,
            **_pcts(lat),
            "by_sub_questions": by_subs,
            "buckets": buckets,
            "rss_mb_sessions": rss,
            "rss_growth_mb": round(rss[-1][1] - rss[0][1], 1) if rss else 0,
            # growth over the second half only: a GC-bounded server rises
            # while sessions accumulate toward the timeout, then plateaus
            "rss_growth_2nd_half_mb": round(
                rss[-1][1] - rss[len(rss) // 2][1], 1) if rss else 0,
            **({"malloc_growth_2nd_half": malloc_top}
               if malloc_top is not None else {}),
        },
    }


async def main_async(args) -> dict:
    from aiohttp import web

    from ..serving.server import create_app

    stack = build_test_stack(args.corpus_size,
                             session_timeout_s=args.session_timeout)
    if getattr(args, "no_alloc_hygiene", False):
        # A/B control arm: reproduce the pre-r05 allocator behavior
        stack.config.serving.malloc_arena_max = 0
        stack.config.serving.malloc_trim_s = 0.0
    app = create_app(stack, bearer_token="")
    runner = web.AppRunner(app)
    await runner.setup()
    site = web.TCPSite(runner, "127.0.0.1", args.port)
    await site.start()
    try:
        if args.soak_seconds > 0:
            result = await run_soak(args.port, args.concurrency,
                                    args.soak_seconds, args.churn,
                                    trace_malloc=args.trace_malloc)
        else:
            result = await run_stress(args.port, args.concurrency,
                                      args.requests)
        trimmer = app.get("malloc_trimmer")
        result["detail"]["allocator_hygiene"] = {
            "malloc_arena_max": stack.config.serving.malloc_arena_max,
            "malloc_trim_s": stack.config.serving.malloc_trim_s,
            "trims": getattr(trimmer, "trims", 0),
            "trims_released_pages": getattr(trimmer, "released", 0),
        }
    finally:
        await runner.cleanup()
        stack.close()
    return result


def main(argv: Optional[List[str]] = None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--corpus-size", type=int, default=10_000)
    parser.add_argument("--concurrency", type=int, default=8)
    parser.add_argument("--requests", type=int, default=64)
    parser.add_argument("--port", type=int, default=18321)
    parser.add_argument("--soak-seconds", type=float, default=0.0,
                        help="run a sustained soak for N seconds (80/15/5 "
                             "sub-question mix + session churn) instead of "
                             "the fixed-request burst")
    parser.add_argument("--churn", type=int, default=8,
                        help="soak: open a fresh session after every N "
                             "requests per slot")
    parser.add_argument("--trace-malloc", action="store_true",
                        help="soak: tracemalloc diff mid-run vs end — "
                             "separates real retention from allocator "
                             "fragmentation (adds CPU overhead)")
    parser.add_argument("--no-alloc-hygiene", action="store_true",
                        help="disable the glibc arena cap + periodic "
                             "malloc_trim (the pre-r05 behavior; control "
                             "arm for the soak A/B)")
    parser.add_argument("--session-timeout", type=int, default=1800,
                        help="server session GC timeout in seconds; set "
                             "short (e.g. 60) to demonstrate the RSS "
                             "plateau once the sweep reclaims sessions")
    parser.add_argument("--out", default=None)
    args = parser.parse_args(argv)

    result = asyncio.run(main_async(args))
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
