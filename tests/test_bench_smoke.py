"""bench.py contract test: the driver parses the LAST JSON line on
stdout, and round 3 died (rc:124, parsed:null) because the only print sat
after the slow optional sections. One tiny-shape subprocess run pins the
survival properties: headline JSON prints even with the optional-section
budget gate CLOSED (--budget-s 0), stdout stays JSON-only, and stderr
carries phase stamps so a timeout's tail shows where the time went."""

import json
import os
import subprocess
import sys

import pytest

# slow tier: excluded from the default run (pytest.ini -m 'not slow');
# the full matrix runs with `pytest -m ""`
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_headline_survives_closed_budget_gate():
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--corpus-size", "300", "--iters", "2", "--warmup", "1",
         "--concurrency", "2", "--qps-queries", "4", "--seq", "64",
         "--budget-s", "0"],
        capture_output=True, text=True, timeout=600, cwd=REPO, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in r.stdout.splitlines() if l.strip()]
    # headline prints BEFORE any optional section runs; later sections
    # (rerank roofline) REPRINT the augmented result — the driver parses
    # the LAST JSON line. With the budget gate closed the 1M section must
    # not run, and every stdout line must be valid JSON.
    assert 1 <= len(lines) <= 2, lines
    for line in lines:
        json.loads(line)
    out = json.loads(lines[-1])
    assert out["metric"] == "retrieve_rerank_p50"
    assert out["unit"] == "ms"
    assert out["value"] > 0
    assert out["vs_baseline"] > 0
    d = out["detail"]
    assert d["qps"] > 0 and d["elapsed_headline_s"] > 0
    assert "corpus_1m" not in d
    # phase stamps land on stderr so a timeout's tail shows WHERE it died
    assert "[bench +" in r.stderr
    assert "warmup done; measuring p50" in r.stderr
