"""Analytical request-latency model (Monte-Carlo queueing simulation).

Capability parity with reference experiments/profile/stress_theory.js: a
request = rewrite + HyDE + (retrieve+rerank per sub-question, scaled by
concurrent users when the rerank stage serializes) + sub-answer + merge,
with a query mix of 80/15/5% for 1/2/3 sub-questions
(stress_theory.js:2-15,49-58); reports p50/p95/p99 per concurrency level.

The reference's measured step times (rewrite 2.45 s, HyDE 4.2 s,
retrieve+rerank 4.0 s, answer 4.7 s, merge 1.7 s) are the defaults; pass
your own measured times (e.g. bench.py output) to model the TPU stack, and
set ``rerank_serialized=False`` to model the continuous batcher replacing
the reference's global reranker lock.
"""

from __future__ import annotations

import random
import statistics
from dataclasses import dataclass, field
from typing import Dict, Sequence


@dataclass
class StageTimes:
    rewrite_s: float = 2.45          # stress_theory.js:3 (range 2.1-2.8)
    rewrite_jitter_s: float = 0.35
    hyde_s: float = 4.2              # stress_theory.js:4
    retrieve_rerank_s: float = 4.0   # stress_theory.js:5
    answer_s: float = 4.7            # stress_theory.js:6
    merge_s: float = 1.7             # stress_theory.js:7
    # 80% one sub-question / 15% two / 5% three (stress_theory.js:12-15)
    subq_mix: Sequence[float] = field(default_factory=lambda: (0.80, 0.15, 0.05))


def _num_subquestions(rng: random.Random, mix: Sequence[float]) -> int:
    r = rng.random()
    acc = 0.0
    for i, p in enumerate(mix):
        acc += p
        if r < acc:
            return i + 1
    return len(mix)


def simulate_request(rng: random.Random, times: StageTimes, users: int,
                     rerank_serialized: bool = True,
                     use_hyde: bool = False) -> float:
    n_sub = _num_subquestions(rng, times.subq_mix)
    total = times.rewrite_s + rng.uniform(-times.rewrite_jitter_s,
                                          times.rewrite_jitter_s)
    if use_hyde:
        total += times.hyde_s
    # the reference's retrieve+rerank stage serializes on the shared
    # reranker lock, so it scales with sub-questions x concurrent users
    # (stress_theory.js:52); a continuous batcher removes the users factor
    contention = users if rerank_serialized else 1
    total += times.retrieve_rerank_s * n_sub * contention
    # sub-answers run concurrently (asyncio.gather)
    total += times.answer_s
    if n_sub > 1:
        total += times.merge_s
    return total


def simulate_latency(user_levels: Sequence[int] = (1, 3, 5, 10),
                     times: StageTimes = StageTimes(),
                     n_requests: int = 2000,
                     rerank_serialized: bool = True,
                     use_hyde: bool = False,
                     seed: int = 0) -> Dict[int, Dict[str, float]]:
    """p50/p95/p99 end-to-end latency per concurrency level."""
    rng = random.Random(seed)
    out: Dict[int, Dict[str, float]] = {}
    for users in user_levels:
        samples = [
            simulate_request(rng, times, users, rerank_serialized, use_hyde)
            for _ in range(n_requests)
        ]
        samples.sort()
        out[users] = {
            "p50": statistics.median(samples),
            "p95": samples[int(0.95 * len(samples))],
            "p99": samples[int(0.99 * len(samples))],
            "mean": statistics.mean(samples),
        }
    return out
