"""Wave-batched retrieval+rerank for concurrent sessions.

The reference serializes every session's retrieve->rerank behind a global
reranker lock (reference: src/utils/vllmChatService.py:88-90). Here each
session thread enqueues its own FusedServePath program (async device
dispatch — free) and a dispatcher thread completes WAVES: one
``jax.device_get`` over every in-flight request's outputs, so the
host<->device transport round-trip (~28 ms on this relay) is paid once per
wave instead of once per request. With B concurrent sessions the server's
throughput approaches the bench's serve_wave numbers instead of 1/RTT.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import List, Optional, Sequence, Tuple

from ..utils.profiler import profiler


class RetrievalBatcher:
    """Coalesces FusedServePath completions across sessions into waves."""

    def __init__(self, serve_path, max_batch: int = 16,
                 max_wait_ms: float = 3.0, name: str = "retrieval") -> None:
        self.serve_path = serve_path
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1000.0
        self._queue: "queue.Queue[Optional[Tuple]]" = queue.Queue()
        self._closed = False
        self._thread = threading.Thread(
            target=self._dispatch_loop, name=f"{name}-batcher", daemon=True)
        self._thread.start()

    # ------------------------------------------------------------------
    def submit(self, query: str, hyde_chunks: Sequence[str],
               query_time) -> "Future":
        """Tokenize + dispatch in the caller's thread (parallel host prep),
        then hand the in-flight device outputs to the wave dispatcher.
        Resolves to (chunks, selected_bundle_ids, diag)."""
        if self._closed:
            raise RuntimeError("RetrievalBatcher is closed")
        fut: Future = Future()
        # per-request mega-program (search+rerank+select in one): measured
        # fastest on v5e — see FusedServePath.serve_wave's batch_rerank note
        out = self.serve_path.enqueue(query, list(hyde_chunks), query_time)
        self._queue.put((out, fut))
        return fut

    def retrieve(self, query: str, hyde_chunks: Sequence[str], query_time,
                 timeout: Optional[float] = None):
        return self.submit(query, hyde_chunks, query_time).result(timeout)

    # ------------------------------------------------------------------
    def _dispatch_loop(self) -> None:
        import jax

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
            batch: List[Tuple] = [first]
            t0 = time.perf_counter()
            while len(batch) < self.max_batch:
                remaining = self.max_wait_s - (time.perf_counter() - t0)
                if remaining <= 0:
                    break
                try:
                    item = self._queue.get(timeout=remaining)
                except queue.Empty:
                    break
                if item is None:
                    self._complete(jax, batch)
                    self._drain_failed()
                    return
                batch.append(item)
            self._complete(jax, batch)

    def _drain_failed(self) -> None:
        """Fail any request that raced past the closed-check — a future
        left in the queue after the dispatcher exits would hang its
        session thread forever."""
        while True:
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                return
            if item is not None and not item[1].done():
                item[1].set_exception(
                    RuntimeError("RetrievalBatcher closed"))

    def _complete(self, jax, batch: List[Tuple]) -> None:
        try:
            with profiler.span("retrieval_wave_readback"):
                host = jax.device_get([out for out, _ in batch])
        except Exception as exc:
            for _, fut in batch:
                if not fut.done():
                    fut.set_exception(exc)
            return
        profiler.add_metric("retrieval_wave_size", len(batch))
        for (_, fut), h in zip(batch, host):
            try:
                fut.set_result(self.serve_path._format(h))
            except Exception as exc:
                if not fut.done():
                    fut.set_exception(exc)

    # ------------------------------------------------------------------
    def close(self) -> None:
        self._closed = True
        self._queue.put(None)
        self._thread.join(timeout=5)
