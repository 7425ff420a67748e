"""Host allocator hygiene for long-running servers (glibc arenas).

The r04 soak (SOAK_r04.json) measured ~0.65 MB/s RSS growth over 40 min
with tracemalloc showing Python retention bounded — classic glibc arena
retention: per-thread arenas keep freed chunks mapped, so a multi-threaded
aiohttp + tokenizer + JAX host process accretes resident-but-free memory
that the allocator never returns to the kernel.

Two standard mitigations, both exposed here as library calls so the
serving layer owns them instead of relying on deploy-time env vars
(``MALLOC_ARENA_MAX=2`` before process start is equivalent to
``set_arena_max(2)`` at import time):

* ``set_arena_max(n)`` — ``mallopt(M_ARENA_MAX, n)``: caps the number of
  malloc arenas (glibc default is 8 x cores, each up to 64 MB of
  retained free space).
* ``malloc_trim()`` / ``MallocTrimmer`` — ``malloc_trim(0)`` walks free
  lists and returns releasable pages to the kernel; the trimmer thread
  does it on a period (a trim is O(free chunks), typically <1 ms at
  serving heap sizes — measured in SOAK_r05).

The reference has no soak story at all (its stress_test.py:288-326 dumps
rates and exits); this is the repo's own production bar.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import logging
import threading
from typing import Optional

logger = logging.getLogger(__name__)

M_ARENA_MAX = -8   # glibc malloc.h

_libc: Optional[ctypes.CDLL] = None
_libc_missing = False


def _load_libc() -> Optional[ctypes.CDLL]:
    global _libc, _libc_missing
    if _libc is not None or _libc_missing:
        return _libc
    try:
        _libc = ctypes.CDLL(ctypes.util.find_library("c") or "libc.so.6",
                            use_errno=True)
    except OSError:
        _libc_missing = True
        logger.warning("libc unavailable; allocator hygiene disabled")
    return _libc


def set_arena_max(n: int) -> bool:
    """Cap glibc malloc arenas (``mallopt(M_ARENA_MAX, n)``). Returns True
    on success; safe no-op on non-glibc platforms."""
    libc = _load_libc()
    if libc is None or not hasattr(libc, "mallopt"):
        return False
    try:
        return bool(libc.mallopt(M_ARENA_MAX, int(n)))
    except Exception:   # noqa: BLE001 — never break serving over mallopt
        return False


def malloc_trim() -> bool:
    """Return releasable free heap pages to the kernel. Returns True when
    memory was actually released (glibc semantics)."""
    libc = _load_libc()
    if libc is None or not hasattr(libc, "malloc_trim"):
        return False
    try:
        return bool(libc.malloc_trim(0))
    except Exception:   # noqa: BLE001
        return False


class MallocTrimmer:
    """Daemon thread trimming the heap every ``period_s`` seconds."""

    def __init__(self, period_s: float = 60.0) -> None:
        self.period_s = float(period_s)
        self.trims = 0
        self.released = 0     # trims that actually returned pages
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def start(self) -> "MallocTrimmer":
        if self._thread is None:
            self._thread = threading.Thread(
                target=self._loop, daemon=True, name="malloc-trimmer")
            self._thread.start()
        return self

    def _loop(self) -> None:
        while not self._stop.wait(self.period_s):
            self.trims += 1
            if malloc_trim():
                self.released += 1

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None
