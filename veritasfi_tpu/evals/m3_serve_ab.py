"""Interleaved A/B: fused serve p50 with in-program M3 fusion OFF vs ON.

The classic candidate-stage M3 hook costs one extra device dispatch +
readback per query (~30 ms of relay round-trip at production head dims —
M3_r04.json ``tpu_serve_cost``). Round 4 folds the gather+score into the
fused serve program and chains the query-side M3 encode as a no-readback
dispatch; this harness measures what that actually costs end-to-end, the
way BF16_AB_r04 settled the bf16-at-1M claim: interleaved off/on rounds
(ambient relay RTT drifts minute-to-minute, so unpaired runs lie), fresh
query strings every iteration (the scorer caches query encodes by string;
serving traffic doesn't repeat), per-round and overall medians.

Construction mirrors bench.py's headline settings: 10k-chunk corpus,
bge-small encoder (bf16, tanh gelu), bge-reranker-base shape (bf16, Pallas
short-seq attention), rerank cap 50. The M3 side runs PRODUCTION head
dims — XLM-R-large trunk (24L/1024H) for the chained query encode,
colbert_dim 1024, doc_max_length 128 — with RANDOM corpus token
representations shipped via ``M3CandidateScorer.from_arrays``: serve-time
cost depends on array shapes and the trunk forward, not on what the
numbers are, and encoding 10k chunks through a random trunk would add
minutes of build for identical latency. Quality evidence lives in
evals/m3_eval.py (M3_r04.json), not here.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import statistics
import sys
import time
from typing import List

import numpy as np


def _log(msg: str) -> None:
    print(f"[m3-ab +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


_T0 = time.perf_counter()


def build_serve_stack(corpus_size: int, seq: int, rng):
    """bench.py's headline construction (corpus, encoder, reranker)."""
    import jax
    import jax.numpy as jnp

    from ..ingest.corpus import build_corpus_index, normalize_rows
    from ..models.encoder import ENCODER_PRESETS, TextEncoder
    from ..models.encoder_reranker import (RERANKER_ENCODER_PRESETS,
                                           EncoderReranker)
    from ..retrieval.bm25 import BM25Index

    # the corpus synth lives in the repo-root bench script (this harness
    # must measure the exact fixture the headline bench serves)
    import os

    root = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    if root not in sys.path:
        sys.path.insert(0, root)
    from bench import make_synth_corpus

    records, titles = make_synth_corpus(corpus_size, rng)
    dim = 384
    index = build_corpus_index(records, titles, embed_fn=None)
    index.embeddings = normalize_rows(
        rng.normal(size=(index.num_chunks, dim)).astype(np.float32))
    index.ts_embeddings = normalize_rows(
        rng.normal(size=(len(titles), dim)).astype(np.float32))
    bm25 = BM25Index.build(index.texts, index.doc_ids)

    enc_arch = dataclasses.replace(ENCODER_PRESETS["bge-small-en"],
                                   gelu_impl="tanh")
    rr_arch = dataclasses.replace(
        RERANKER_ENCODER_PRESETS["bge-reranker-base"], gelu_impl="tanh",
        attn_impl="pallas")

    def _to_bf16(t):
        return t.astype(jnp.bfloat16) if t.dtype == jnp.float32 else t

    tpu0 = jax.devices()[0]
    with jax.default_device(jax.devices("cpu")[0]):
        enc_init = TextEncoder(
            arch=dataclasses.replace(enc_arch, attn_impl="xla"),
            dtype=jnp.bfloat16, max_length=256)
        rr_init = EncoderReranker(
            arch=dataclasses.replace(rr_arch, attn_impl="xla"),
            dtype=jnp.bfloat16, passage_max_length=seq)
        enc_bf = jax.tree.map(_to_bf16, enc_init.params)
        rr_bf = jax.tree.map(_to_bf16, rr_init.params)
    encoder = TextEncoder(arch=enc_arch, dtype=jnp.bfloat16, max_length=256,
                          params=jax.device_put(enc_bf, tpu0))
    reranker = EncoderReranker(arch=rr_arch, dtype=jnp.bfloat16,
                               passage_max_length=seq,
                               params=jax.device_put(rr_bf, tpu0))
    return index, bm25, encoder, reranker


def build_m3_scorer(index, doc_max_length: int, rng,
                    preset: str = "bge-m3"):
    """Production-dim M3 scorer: real bge-m3 trunk arch (random weights,
    host-CPU init like the bench's other models), random corpus token
    representations at [N, doc_max_length(, colbert_dim)].
    ``preset='tiny-test'`` is the CPU smoke-test configuration."""
    import jax
    import jax.numpy as jnp

    from ..models.m3_heads import M3_PRESETS, M3Encoder
    from ..retrieval.m3_scorer import M3CandidateScorer

    arch = M3_PRESETS[preset]
    tpu0 = jax.devices()[0]
    _log(f"initializing {preset} trunk on host CPU")
    with jax.default_device(jax.devices("cpu")[0]):
        m3_init = M3Encoder(preset=preset, dtype=jnp.bfloat16,
                            max_length=64, seed=0)
        m3_params = jax.tree.map(
            lambda t: t.astype(jnp.bfloat16)
            if t.dtype == jnp.float32 else t, m3_init.params)
    m3_enc = M3Encoder(arch=arch, dtype=jnp.bfloat16, max_length=64,
                       params=jax.device_put(m3_params, tpu0),
                       tokenizer=m3_init.tokenizer)
    del m3_init, m3_params

    n = index.num_chunks
    L, dc, h = doc_max_length, arch.colbert_dim, arch.trunk.hidden
    _log(f"shipping random corpus token reps: [{n}, {L}] ids/weights + "
         f"[{n}, {L}, {dc}] colbert (bf16)")
    d_dense = jnp.asarray(
        rng.normal(size=(n, h)).astype(np.float32)).astype(jnp.bfloat16)
    d_ids = jnp.asarray(rng.integers(
        5, arch.trunk.vocab_size, size=(n, L)).astype(np.int32))
    d_sparse = jnp.asarray(np.abs(
        rng.normal(size=(n, L))).astype(np.float32)).astype(jnp.bfloat16)
    # ship the big array in one transfer; values don't matter for latency
    d_col = jnp.asarray(
        rng.normal(size=(n, L, dc)).astype(np.float32)).astype(jnp.bfloat16)
    mask_len = rng.integers(L // 2, L + 1, size=n)
    d_mask = jnp.asarray(np.arange(L)[None, :] < mask_len[:, None])
    d_tok = jnp.asarray(
        (np.arange(L)[None, :] < mask_len[:, None])
        & (np.arange(L)[None, :] >= 1))
    scorer = M3CandidateScorer.from_arrays(
        m3_enc, d_dense, d_ids, d_sparse, d_col, d_mask, d_tok)
    _log(f"M3 corpus reps resident: {scorer.hbm_bytes / 2**30:.2f} GiB HBM")
    return scorer


def make_queries(n: int, rng) -> List[str]:
    words = ["revenue", "margin", "delivery", "vehicles", "stores",
             "europe", "china", "quarter", "growth", "cash", "battery",
             "guidance", "capex"] + [f"tok{i}" for i in range(200)]
    return ["What was the " + " ".join(rng.choice(words, size=7))
            + " this quarter?" for _ in range(n)]


HYDE = [
    "Revenue grew strongly in the quarter driven by premium segment "
    "deliveries across china and europe with improved margin guidance.",
    "[Table Level] Table Title: quarterly revenue. Row 1: Q1 revenue "
    "growth. Row 2: delivery volumes by region and segment.",
    "Cash flow and capex guidance improved with battery cost declines "
    "and store expansion across europe markets.",
]


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--corpus-size", type=int, default=10_000)
    parser.add_argument("--rounds", type=int, default=5)
    parser.add_argument("--iters", type=int, default=12,
                        help="queries per arm per round (fresh strings)")
    parser.add_argument("--cap", type=int, default=50)
    parser.add_argument("--pool", type=int, default=128)
    parser.add_argument("--doc-max-length", type=int, default=128)
    parser.add_argument("--seq", type=int, default=256)
    parser.add_argument("--m3-preset", default="bge-m3",
                        choices=["bge-m3", "tiny-test"],
                        help="tiny-test = CPU smoke configuration")
    parser.add_argument("--out", default=None)
    args = parser.parse_args(argv)

    from ..retrieval.fused_serve import FusedServePath

    rng = np.random.default_rng(0)
    _log("building serve stack (bench headline settings)")
    index, bm25, encoder, reranker = build_serve_stack(
        args.corpus_size, args.seq, rng)
    _log("pre-tokenizing corpus passages")
    for t in index.texts:
        reranker.tokenize_passage(t)

    plain = FusedServePath(index, reranker, encoder=encoder, bm25=bm25,
                           k=10, enable_expand=True, depth=2048,
                           rerank_cap=args.cap, chunk_topk=5)
    scorer = build_m3_scorer(index, args.doc_max_length, rng,
                             preset=args.m3_preset)
    with_m3 = FusedServePath(index, reranker, encoder=encoder, bm25=bm25,
                             k=10, enable_expand=True, depth=2048,
                             rerank_cap=args.cap, chunk_topk=5,
                             m3_scorer=scorer, m3_pool=args.pool,
                             device_emb=plain._emb,
                             device_ts_emb=plain._ts_emb)

    need = 2 * args.rounds * args.iters + 8
    queries = make_queries(need, rng)
    qi = iter(queries)

    _log("warmup/compile: m3-off program")
    for _ in range(3):
        plain.serve(next(qi), HYDE, "2024-06-01")
    _log("warmup/compile: m3-on program (chained encode + mega-program)")
    for _ in range(3):
        with_m3.serve(next(qi), HYDE, "2024-06-01")
    _log("warmup done; measuring")

    def run_arm(path, k):
        lat = []
        for _ in range(k):
            q = next(qi)
            t0 = time.perf_counter()
            path.serve(q, HYDE, "2024-06-01")
            lat.append((time.perf_counter() - t0) * 1000.0)
        return lat

    per_round = []
    all_off, all_on = [], []
    for r in range(args.rounds):
        off = run_arm(plain, args.iters)
        on = run_arm(with_m3, args.iters)
        all_off += off
        all_on += on
        per_round.append({
            "off_p50_ms": round(statistics.median(off), 2),
            "on_p50_ms": round(statistics.median(on), 2),
        })
        _log(f"round {r}: off {per_round[-1]['off_p50_ms']} ms, "
             f"on {per_round[-1]['on_p50_ms']} ms")

    off_p50 = statistics.median(all_off)
    on_p50 = statistics.median(all_on)
    result = {
        "metric": "m3_in_serve_overhead_p50",
        "value": round(on_p50 - off_p50, 2),
        "unit": "ms",
        "vs_baseline": None,
        "detail": {
            "off_p50_ms": round(off_p50, 2),
            "on_p50_ms": round(on_p50, 2),
            "off_p90_ms": round(sorted(all_off)[int(0.9 * len(all_off))], 2),
            "on_p90_ms": round(sorted(all_on)[int(0.9 * len(all_on))], 2),
            "per_round": per_round,
            "rounds": args.rounds,
            "iters_per_arm_per_round": args.iters,
            "corpus_size": args.corpus_size,
            "rerank_cap": args.cap,
            "m3_pool": args.pool,
            "doc_max_length": args.doc_max_length,
            "colbert_dim": scorer.d_col.shape[-1],
            "m3_hbm_gib": round(scorer.hbm_bytes / 2**30, 2),
            "classic_hook_cost_ms": 34.5,
            "classic_hook_source": "M3_r04.json tpu_serve_cost (separate "
                                   "gather+score dispatch)",
            "note": "fresh query strings every iteration (no query-encode "
                    "cache hits); random corpus token reps via "
                    "from_arrays — latency depends on shapes, not values",
        },
    }
    line = json.dumps(result)
    print(line, flush=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
