"""Host-side span/metric profiler.

Capability parity with the reference's global Profiler singleton
(reference: src/utils/profiler.py:7-197): decorator + manual start/end
timers + named numeric metrics, aggregated to
count/min/max/mean/median/p95/p99/stddev and dumped to JSON.

TPU additions: optional ``jax.profiler`` trace capture around a span and
device-memory snapshots (the reference logged ``torch.cuda.max_memory_allocated``
at load milestones, ragManager.py:53,85).
"""

from __future__ import annotations

import functools
import json
import math
import threading
import time
from collections import deque
from contextlib import contextmanager
from typing import Any, Dict, Optional

# Samples kept per series for percentile estimation. Retention must be
# BOUNDED: a long-lived server records a handful of spans per request, and
# an unbounded list is a slow leak (the r3 soak's RSS-growth audit).
# count/mean/min/max/stddev stay exact over the whole history via running
# moments; median/p95/p99 are over the most recent WINDOW samples.
WINDOW = 4096


class _Series:
    __slots__ = ("count", "total", "sq_total", "lo", "hi", "window")

    def __init__(self) -> None:
        self.count = 0
        self.total = 0.0
        self.sq_total = 0.0
        self.lo = math.inf
        self.hi = -math.inf
        self.window: "deque[float]" = deque(maxlen=WINDOW)

    def add(self, v: float) -> None:
        self.count += 1
        self.total += v
        self.sq_total += v * v
        if v < self.lo:
            self.lo = v
        if v > self.hi:
            self.hi = v
        self.window.append(v)


def _aggregate(series: _Series) -> Dict[str, float]:
    n = series.count
    if n == 0:
        return {"count": 0}
    xs = sorted(series.window)
    m = len(xs)
    mean = series.total / n

    def pct(p: float) -> float:
        if m == 1:
            return xs[0]
        rank = p / 100.0 * (m - 1)
        lo = int(math.floor(rank))
        hi = min(lo + 1, m - 1)
        frac = rank - lo
        return xs[lo] * (1 - frac) + xs[hi] * frac

    var = max(series.sq_total / n - mean * mean, 0.0)
    return {
        "count": n,
        "min": series.lo,
        "max": series.hi,
        "mean": mean,
        "median": pct(50),
        "p95": pct(95),
        "p99": pct(99),
        "stddev": math.sqrt(var),
    }


class Profiler:
    """Thread-safe span timer + metric registry."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._local = threading.local()
        self._durations: Dict[str, _Series] = {}
        self._metrics: Dict[str, _Series] = {}

    # -- spans ---------------------------------------------------------
    def start(self, name: str) -> None:
        starts = getattr(self._local, "starts", None)
        if starts is None:
            starts = self._local.starts = {}
        # per-name STACK: nested/recursive same-name spans must not drop
        # the outer measurement (a flat dict overwrote the outer t0)
        starts.setdefault(name, []).append(time.perf_counter())

    def end(self, name: str) -> float:
        starts = getattr(self._local, "starts", {})
        stack = starts.get(name)
        if not stack:
            return 0.0
        t0 = stack.pop()
        dt = time.perf_counter() - t0
        with self._lock:
            self._durations.setdefault(name, _Series()).add(dt)
        return dt

    @contextmanager
    def span(self, name: str):
        self.start(name)
        try:
            yield
        finally:
            self.end(name)

    def profile_function(self, name: Optional[str] = None):
        def deco(fn):
            span_name = name or fn.__qualname__

            @functools.wraps(fn)
            def wrapper(*args, **kwargs):
                with self.span(span_name):
                    return fn(*args, **kwargs)

            return wrapper

        return deco

    # -- metrics -------------------------------------------------------
    def add_metric(self, name: str, value: float) -> None:
        with self._lock:
            self._metrics.setdefault(name, _Series()).add(float(value))

    # -- reporting -----------------------------------------------------
    def results(self) -> Dict[str, Any]:
        with self._lock:
            return {
                "durations": {k: _aggregate(v) for k, v in self._durations.items()},
                "metrics": {k: _aggregate(v) for k, v in self._metrics.items()},
            }

    def log_profiling_results(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.results(), f, indent=2)

    def reset(self) -> None:
        with self._lock:
            self._durations.clear()
            self._metrics.clear()

    # -- TPU extras ----------------------------------------------------
    @contextmanager
    def device_trace(self, log_dir: str):
        """Capture a jax.profiler trace around a block (TPU timeline)."""
        import jax

        jax.profiler.start_trace(log_dir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()

    def device_memory_stats(self) -> Dict[str, Any]:
        """Per-device memory snapshot (TPU analogue of CUDA mem logging)."""
        import jax

        out = {}
        for d in jax.devices():
            stats = getattr(d, "memory_stats", lambda: None)()
            if stats:
                out[str(d)] = {
                    "bytes_in_use": stats.get("bytes_in_use"),
                    "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                    "bytes_limit": stats.get("bytes_limit"),
                }
        return out


# Global instance, like the reference's module-level ``profiler``.
profiler = Profiler()
