"""Host allocator hygiene (utils/allocator.py): glibc arena cap + trim."""

import time

from veritasfi_tpu.utils.allocator import (MallocTrimmer, malloc_trim,
                                           set_arena_max)


def test_set_arena_max_and_trim_run():
    # glibc host in CI; on other libcs these degrade to False, never raise
    assert set_arena_max(2) in (True, False)
    assert malloc_trim() in (True, False)


def test_trim_releases_after_large_free():
    # allocate + free a large block, then trim: on glibc the trim call
    # itself must succeed (return value True means pages were released —
    # allowed but not required, the block may have been mmapped directly)
    blocks = [bytearray(1 << 20) for _ in range(64)]
    del blocks
    assert malloc_trim() in (True, False)


def test_trimmer_thread_lifecycle():
    tr = MallocTrimmer(period_s=0.05).start()
    time.sleep(0.3)
    tr.stop()
    assert tr.trims >= 2
    assert tr._thread is None
    # idempotent stop
    tr.stop()


def test_serving_config_defaults():
    from veritasfi_tpu.config import Config

    c = Config()
    assert c.serving.malloc_arena_max == 2
    assert c.serving.malloc_trim_s == 60.0
