import threading
import time

import numpy as np
import pytest

from veritasfi_tpu.rerank.batcher import ContinuousBatcher


def sum_scorer(rows):
    return np.array([float(sum(r)) for r in rows], np.float32)


def test_scores_in_order():
    b = ContinuousBatcher(sum_scorer, max_batch=4, max_wait_ms=1)
    rows = [[1, 2], [3], [4, 5, 6]]
    out = b.score(rows, timeout=5)
    np.testing.assert_allclose(out, [3.0, 3.0, 15.0])
    b.close()


def test_concurrent_submissions_coalesce():
    calls = []

    def scorer(rows):
        calls.append(len(rows))
        return sum_scorer(rows)

    b = ContinuousBatcher(scorer, max_batch=16, max_wait_ms=50)
    results = [None] * 8
    threads = []

    def submit(i):
        results[i] = b.score([[i], [i, i]], timeout=5)

    for i in range(8):
        t = threading.Thread(target=submit, args=(i,))
        t.start()
        threads.append(t)
    [t.join() for t in threads]
    for i in range(8):
        np.testing.assert_allclose(results[i], [i, 2 * i])
    # coalescing happened: fewer scorer calls than submissions (16 rows total)
    assert sum(calls) == 16
    assert len(calls) < 16
    b.close()


def test_empty_submit():
    b = ContinuousBatcher(sum_scorer)
    assert b.score([], timeout=1).shape == (0,)
    b.close()


def test_error_propagates():
    def bad(rows):
        raise RuntimeError("boom")

    b = ContinuousBatcher(bad, max_wait_ms=1)
    with pytest.raises(RuntimeError, match="boom"):
        b.score([[1]], timeout=5)
    b.close()


def test_length_bucketing():
    seen = []

    def scorer(rows):
        seen.append([len(r) for r in rows])
        return sum_scorer(rows)

    b = ContinuousBatcher(scorer, max_batch=16, max_wait_ms=50,
                          bucket_tolerance=2.0)
    rows = [[1] * 4, [1] * 100, [1] * 5, [1] * 110]
    out = b.score(rows, timeout=5)
    np.testing.assert_allclose(out, [4, 100, 5, 110])
    # short and long rows were not padded into one group
    for group in seen:
        assert max(group) <= min(group) * 2.0
    b.close()


def test_batcher_submit_after_close_raises():
    import numpy as np
    import pytest as _pytest

    from veritasfi_tpu.rerank.batcher import ContinuousBatcher

    b = ContinuousBatcher(lambda rows: np.zeros((len(rows),), np.float32))
    b.close()
    with _pytest.raises(RuntimeError):
        b.submit_tokens([[1, 2, 3]])


def test_batcher_score_length_mismatch_raises():
    import numpy as np
    import pytest as _pytest

    from veritasfi_tpu.rerank.batcher import ContinuousBatcher

    b = ContinuousBatcher(lambda rows: np.zeros((1,), np.float32))
    try:
        with _pytest.raises(RuntimeError):
            b.score([[1, 2], [3, 4]], timeout=30)
    finally:
        b.close()
