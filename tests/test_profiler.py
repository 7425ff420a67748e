import json
import threading

from veritasfi_tpu.utils.profiler import (WINDOW, Profiler, _aggregate,
                                          _Series)


def _series(values):
    s = _Series()
    for v in values:
        s.add(v)
    return s


def test_span_and_decorator():
    p = Profiler()

    @p.profile_function(name="work")
    def work():
        return 42

    assert work() == 42
    with p.span("manual"):
        pass
    res = p.results()
    assert res["durations"]["work"]["count"] == 1
    assert res["durations"]["manual"]["count"] == 1


def test_metrics_aggregation():
    p = Profiler()
    for v in [1, 2, 3, 4, 100]:
        p.add_metric("retrieved_chunks", v)
    agg = p.results()["metrics"]["retrieved_chunks"]
    assert agg["count"] == 5
    assert agg["min"] == 1 and agg["max"] == 100
    assert agg["median"] == 3
    assert agg["p99"] >= agg["p95"] >= agg["median"]


def test_aggregate_edge_cases():
    assert _aggregate(_series([])) == {"count": 0}
    one = _aggregate(_series([5.0]))
    assert one["min"] == one["max"] == one["p95"] == 5.0


def test_bounded_retention_keeps_exact_count_min_max_mean():
    # long-lived server: count/mean/min/max stay exact past the window,
    # percentiles are over the recent WINDOW samples
    s = _series(range(WINDOW + 100))
    assert len(s.window) == WINDOW
    agg = _aggregate(s)
    n = WINDOW + 100
    assert agg["count"] == n
    assert agg["min"] == 0 and agg["max"] == n - 1
    assert abs(agg["mean"] - (n - 1) / 2) < 1e-9
    # window holds the most recent samples: [100, n)
    assert agg["median"] >= 100


def test_thread_safety_and_dump(tmp_path):
    p = Profiler()

    def worker():
        for _ in range(50):
            with p.span("s"):
                pass
            p.add_metric("m", 1)

    threads = [threading.Thread(target=worker) for _ in range(4)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    assert p.results()["durations"]["s"]["count"] == 200
    out = str(tmp_path / "prof.json")
    p.log_profiling_results(out)
    assert json.load(open(out))["metrics"]["m"]["count"] == 200


def test_end_without_start():
    p = Profiler()
    assert p.end("nope") == 0.0


def test_reset():
    p = Profiler()
    p.add_metric("x", 1)
    p.reset()
    assert p.results() == {"durations": {}, "metrics": {}}


def test_nested_same_name_spans_record_both():
    from veritasfi_tpu.utils.profiler import Profiler

    p = Profiler()
    import time as _time

    p.start("x")
    _time.sleep(0.01)
    p.start("x")
    inner = p.end("x")
    outer = p.end("x")
    assert outer >= inner and outer >= 0.01
    stats = p.results()["durations"]["x"]
    assert stats["count"] == 2
