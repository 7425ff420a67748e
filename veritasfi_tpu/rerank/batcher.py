"""Continuous batching for the cross-encoder reranker.

The reference serializes every session's rerank through a global
``reranker_lock`` around compute_score (reference:
src/utils/vllmChatService.py:88-90, vllmManager.py:450) — one request at a
time on the accelerator. Here concurrent sessions submit scoring work to a
queue; a dispatcher thread coalesces pending pairs across requests into
length-bucketed device batches (no head-of-line blocking on one session's
long passage list), runs the jitted forward, and resolves per-request
futures. Throughput scales with batch occupancy instead of lock contention.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass
from typing import Callable, List, Optional, Sequence

import numpy as np


@dataclass
class _WorkItem:
    tokens: List[int]
    future: Future
    slot: int


class ContinuousBatcher:
    """Coalesces token rows into batches for a ``score_tokens`` callable.

    Args:
      score_tokens: List[List[int]] -> np.ndarray of scores (jitted forward).
      max_batch: maximum rows per device batch (reference batch_size=8,
        vllmManager.py:451, is the *per-call* analogue; occupancy here is
        across sessions).
      max_wait_ms: dispatcher linger before launching a partial batch.
      bucket_tolerance: rows are grouped so padded length stays within this
        factor of each row's own length (limits pad waste).
    """

    def __init__(
        self,
        score_tokens: Callable[[List[List[int]]], np.ndarray],
        max_batch: int = 32,
        max_wait_ms: float = 2.0,
        bucket_tolerance: float = 2.0,
        name: str = "reranker",
        max_pending: int = 0,
    ) -> None:
        self._score_tokens = score_tokens
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1000.0
        self.bucket_tolerance = bucket_tolerance
        # max_pending > 0 bounds the queue (config rerank.max_pending):
        # submitters block when the device falls behind, backpressure
        # instead of unbounded memory growth
        self._queue: "queue.Queue[Optional[_WorkItem]]" = queue.Queue(
            maxsize=max_pending)
        self._closed = False
        self._thread = threading.Thread(
            target=self._dispatch_loop, name=f"{name}-batcher", daemon=True
        )
        self._thread.start()

    # ------------------------------------------------------------------
    def submit_tokens(self, rows: Sequence[List[int]]) -> "Future[np.ndarray]":
        """Submit token rows; resolves to np.ndarray of scores in order."""
        if self._closed:
            raise RuntimeError("ContinuousBatcher is closed")
        result: "Future[np.ndarray]" = Future()
        if not rows:
            result.set_result(np.zeros((0,), np.float32))
            return result
        out = np.zeros(len(rows), np.float32)
        pending = {"count": len(rows)}
        lock = threading.Lock()

        def make_child(slot: int) -> Future:
            child: Future = Future()

            def done(f: Future) -> None:
                if f.exception() is not None:
                    if not result.done():
                        result.set_exception(f.exception())
                    return
                out[slot] = f.result()
                with lock:
                    pending["count"] -= 1
                    if pending["count"] == 0 and not result.done():
                        result.set_result(out)

            child.add_done_callback(done)
            return child

        for slot, row in enumerate(rows):
            self._queue.put(_WorkItem(list(row), make_child(slot), slot))
        return result

    def score(self, rows: Sequence[List[int]], timeout: Optional[float] = None) -> np.ndarray:
        return self.submit_tokens(rows).result(timeout)

    # ------------------------------------------------------------------
    def _dispatch_loop(self) -> None:
        while True:
            try:
                first = self._queue.get(timeout=0.1)
            except queue.Empty:
                if self._closed:
                    return
                continue
            if first is None:
                self._drain_failed()
                return
            batch = [first]
            deadline = self.max_wait_s
            # linger to coalesce
            t0 = time.perf_counter()
            while len(batch) < self.max_batch:
                remaining = deadline - (time.perf_counter() - t0)
                if remaining <= 0:
                    break
                try:
                    item = self._queue.get(timeout=remaining)
                except queue.Empty:
                    break
                if item is None:
                    self._run(batch)
                    self._drain_failed()
                    return
                batch.append(item)
            self._run(batch)

    def _drain_failed(self) -> None:
        """Fail any item that raced past the closed-check: a future left
        queued after the dispatcher exits would hang its caller forever."""
        while True:
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                return
            if item is not None and not item.future.done():
                item.future.set_exception(
                    RuntimeError("ContinuousBatcher closed"))

    def _run(self, batch: List[_WorkItem]) -> None:
        # group rows into length buckets to limit pad waste
        batch.sort(key=lambda w: len(w.tokens))
        groups: List[List[_WorkItem]] = []
        for item in batch:
            if (
                groups
                and len(item.tokens)
                <= len(groups[-1][0].tokens) * self.bucket_tolerance
                and len(groups[-1]) < self.max_batch
            ):
                groups[-1].append(item)
            else:
                groups.append([item])
        for group in groups:
            try:
                scores = self._score_tokens([w.tokens for w in group])
                if len(scores) != len(group):
                    raise RuntimeError(
                        f"scorer returned {len(scores)} scores for "
                        f"{len(group)} rows")   # zip would silently hang
                for w, s in zip(group, scores):
                    w.future.set_result(float(s))
            except Exception as exc:  # propagate to submitters
                for w in group:
                    if not w.future.done():
                        w.future.set_exception(exc)

    # ------------------------------------------------------------------
    def close(self) -> None:
        self._closed = True
        self._queue.put(None)
        self._thread.join(timeout=5)
