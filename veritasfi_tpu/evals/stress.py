"""Saturation throughput harnesses.

Capability parity with:
  * reference experiments/profile/stress_test.py — N worker threads running
    the full retrieve -> rerank loop against real models, a warm-up window
    before metrics start (stress_test.py:22-52), overall and recent
    inference-calls/sec (stress_test.py:54-92);
  * reference experiments/retriever/continuous_retrieval.py — retrieval-only
    samples/sec + per-sample latency (continuous_retrieval.py:169-190).
"""

from __future__ import annotations

import statistics
import threading
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence


@dataclass
class StressStats:
    warm_up_s: float = 30.0
    recent_window: int = 100
    _lock: threading.Lock = field(default_factory=threading.Lock)
    _start: float = field(default_factory=time.perf_counter)
    _metrics_start: Optional[float] = None
    total_calls: int = 0
    recent_times: List[float] = field(default_factory=list)

    def add_call(self) -> None:
        now = time.perf_counter()
        with self._lock:
            if now - self._start < self.warm_up_s:
                return
            if self._metrics_start is None:
                self._metrics_start = now
            self.total_calls += 1
            self.recent_times.append(now)
            if len(self.recent_times) > self.recent_window:
                self.recent_times.pop(0)

    def snapshot(self) -> Dict:
        now = time.perf_counter()
        with self._lock:
            if self._metrics_start is None:
                return {"in_warm_up": True,
                        "warm_up_remaining": max(
                            0.0, self.warm_up_s - (now - self._start))}
            elapsed = now - self._metrics_start
            recent_rate = 0.0
            if len(self.recent_times) >= 2:
                span = self.recent_times[-1] - self.recent_times[0]
                if span > 0:
                    recent_rate = (len(self.recent_times) - 1) / span
            return {
                "in_warm_up": False,
                "total_inference_calls": self.total_calls,
                "elapsed_time": elapsed,
                "overall_rate": self.total_calls / elapsed if elapsed else 0.0,
                "recent_rate": recent_rate,
            }


def stress_test(workload: Callable[[], None], num_threads: int = 2,
                duration_s: float = 60.0, warm_up_s: float = 30.0) -> Dict:
    """Runs ``workload`` in N threads until the deadline; returns stats."""
    stats = StressStats(warm_up_s=warm_up_s)
    stop = threading.Event()
    errors: list = []

    def worker():
        while not stop.is_set():
            try:
                workload()
            except Exception as exc:   # a dead thread silently skews rates
                errors.append(repr(exc))
                if len(errors) >= 3 * num_threads:
                    return             # persistent failure; stop burning
                continue
            stats.add_call()

    threads = [threading.Thread(target=worker, daemon=True)
               for _ in range(num_threads)]
    for t in threads:
        t.start()
    time.sleep(duration_s)
    stop.set()
    for t in threads:
        t.join(timeout=30)
    out = stats.snapshot()
    if errors:
        out["errors"] = len(errors)
        out["first_error"] = errors[0]
    return out


def retrieval_throughput(retriever, queries: Sequence[str],
                         n_samples: int = 100,
                         hyde: Optional[Sequence[str]] = None) -> Dict:
    """Retrieval-only samples/sec + latency distribution."""
    hyde = list(hyde or [])
    latencies = []
    t_start = time.perf_counter()
    for i in range(n_samples):
        q = queries[i % len(queries)]
        t0 = time.perf_counter()
        retriever.invoke(q, hyde)
        latencies.append(time.perf_counter() - t0)
    total = time.perf_counter() - t_start
    latencies.sort()
    return {
        "samples_per_sec": n_samples / total,
        "p50_latency_s": statistics.median(latencies),
        "p95_latency_s": latencies[int(0.95 * len(latencies))],
        "mean_latency_s": statistics.mean(latencies),
        "num_samples": n_samples,
    }


def generation_stress(n_requests: int = 8, slots: int = 4,
                      max_new: int = 64, chunk: int = 8,
                      preset: str = "gemma-mini") -> dict:
    """Continuous-batching generation throughput + time-to-first-token with
    the local JAX backend (serving/generation_server.py). The reference
    delegates generation to an external vLLM process; this measures the
    first-party equivalent: N concurrent streams sharing decode programs.

    ``preset``: DECODER_PRESETS key ('gemma-mini' = a scaled-down gemma
    shape for bench plumbing; real checkpoints load via models/hf_loader).
    """
    import time
    from concurrent.futures import ThreadPoolExecutor

    import jax.numpy as jnp

    from ..models.reranker import DECODER_PRESETS, CrossEncoderReranker
    from ..serving.generation_server import GenerationServer

    if preset not in DECODER_PRESETS:
        raise KeyError(
            f"unknown decoder preset {preset!r}; choose from "
            f"{sorted(DECODER_PRESETS)} — silently benchmarking tiny-test "
            "would inflate tokens/s by orders of magnitude")
    arch_name = preset
    rr = CrossEncoderReranker(preset=arch_name, dtype=jnp.bfloat16)
    server = GenerationServer(rr.module, rr.params, slots=slots,
                              window=512, chunk=chunk, max_prompt_len=256)
    prompts = [rr._encode_raw(f"Summarize quarterly metric {i} performance "
                              f"and guidance for the segment.")
               for i in range(n_requests)]
    ttft: list = []
    counts: list = []

    def run(p):
        t0 = time.perf_counter()
        n = 0
        for j, _ in enumerate(server.stream(p, max_new_tokens=max_new,
                                            eos_id=-1)):
            if j == 0:
                ttft.append((time.perf_counter() - t0) * 1000.0)
            n += 1
        counts.append(n)

    try:
        # warm (compile prefill buckets + decode program)
        server.generate(prompts[0], max_new_tokens=4, eos_id=-1)
        t0 = time.perf_counter()
        with ThreadPoolExecutor(n_requests) as ex:
            list(ex.map(run, prompts))
        wall = time.perf_counter() - t0
    finally:
        # sweeps call this repeatedly in one process: an unclosed server
        # leaks its dispatcher thread + KV cache buffers per call
        server.close()
    ttft.sort()
    return {
        "metric": "generation_tokens_per_s",
        "value": round(sum(counts) / wall, 1),
        "detail": {
            "requests": n_requests, "slots": slots, "chunk": chunk,
            "max_new": max_new, "wall_s": round(wall, 2),
            "ttft_p50_ms": round(ttft[len(ttft) // 2], 1),
            "ttft_p90_ms": round(ttft[int(0.9 * len(ttft))], 1),
            "arch": arch_name,
        },
    }


def multiturn_ttft(preset: str = "gemma-mini", turns: int = 4,
                   turn_tokens: int = 96, max_new: int = 48,
                   window: int = 2048, prefill_chunk: int = 64,
                   prefix_cache: bool = True, seed: int = 3) -> dict:
    """Multi-turn chat script TTFT: every turn resends the full history
    (prompt + prior answers + a new user block, the OpenAI-protocol chat
    shape). With the prefix cache the server replays only the new turn's
    suffix; the ablation (prefix_cache=False) re-prefills everything.
    Returns per-turn TTFT so the growing-history effect is visible."""
    import time

    import numpy as np

    import jax.numpy as jnp

    from ..models.reranker import DECODER_PRESETS, CrossEncoderReranker
    from ..serving.generation_server import GenerationServer

    if preset not in DECODER_PRESETS:
        raise KeyError(f"unknown decoder preset {preset!r}")
    rr = CrossEncoderReranker(preset=preset, dtype=jnp.bfloat16)
    rng = np.random.default_rng(seed)
    vocab = rr.module.arch.vocab_size
    server = GenerationServer(rr.module, rr.params, slots=2, window=window,
                              chunk=8, max_prompt_len=window,
                              prefill_chunk=prefill_chunk,
                              prefix_cache=prefix_cache)
    try:
        # warm every prefill width + the decode program
        server.generate(rng.integers(8, vocab, 2 * prefill_chunk).tolist(),
                        max_new_tokens=8, eos_id=-1, temperature=0.0)
        history = rng.integers(8, vocab, turn_tokens).tolist()
        per_turn = []
        for t in range(turns):
            t0 = time.perf_counter()
            first = None
            out = []
            for j, tok in enumerate(server.stream(
                    history, max_new_tokens=max_new, eos_id=-1,
                    temperature=0.0)):
                if j == 0:
                    first = (time.perf_counter() - t0) * 1000.0
                out.append(tok)
            per_turn.append({"turn": t + 1, "history_tokens": len(history),
                             "ttft_ms": round(first, 1)})
            history = history + out + rng.integers(
                8, vocab, turn_tokens).tolist()
    finally:
        server.close()
    return {"preset": preset, "prefix_cache": prefix_cache,
            "turns": per_turn,
            "prefix_hits": server.stats["prefix_hits"],
            "prefix_reused_tokens": server.stats["prefix_reused_tokens"],
            "prefill_chunks": server.stats["prefill_chunks"],
            "last_turn_ttft_ms": per_turn[-1]["ttft_ms"]}
