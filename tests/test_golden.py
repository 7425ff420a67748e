"""Golden-file regression fixtures for the retrieval engine.

Locks the engine's end-to-end retrieval outputs (path tags, doc order,
bundle grouping, scores) for a fixed corpus + query set, so refactors of
the fused kernels or fusion loop can't silently change behavior
(SURVEY.md §4: golden parity tests). Regenerate deliberately with:
    python tests/test_golden.py regenerate
"""

import json
import os
import sys

import numpy as np

from test_ensemble import EMB, make_corpus
from veritasfi_tpu.retrieval.ensemble import EnsembleRetriever

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden",
                           "ensemble_v1.json")

QUERIES = [
    ("zeekr revenue margin", ["hypothetical answer about revenue"]),
    ("stores europe delivery", []),
    ("w5 w11 w23 growth", ["h one", "h two"]),
]


def build_engine(tmp_path):
    idx, bm25 = make_corpus(tmp_path, seed=99, chunks_per_file=25)
    return EnsembleRetriever(idx, EMB.encode, bm25=bm25, k=6,
                             enable_expand=True)


def snapshot(engine):
    out = []
    for q, hyde in QUERIES:
        chunks = engine.invoke(q, hyde)
        out.append([
            {"retriever": c["retriever"],
             "doc_id": c["metadata"]["doc_id"],
             "bundle_id": c["bundle_id"],
             "score": round(float(c["score"]), 5)}
            for c in chunks
        ])
    return out


def test_golden_retrieval(tmp_path):
    engine = build_engine(tmp_path)
    current = snapshot(engine)
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    assert len(current) == len(golden)
    for cur_q, gold_q in zip(current, golden):
        assert len(cur_q) == len(gold_q), (len(cur_q), len(gold_q))
        for c, g in zip(cur_q, gold_q):
            assert c["retriever"] == g["retriever"]
            assert c["doc_id"] == g["doc_id"]
            assert c["bundle_id"] == g["bundle_id"]
            assert abs(c["score"] - g["score"]) < 1e-3


if __name__ == "__main__" and "regenerate" in sys.argv:
    import pathlib
    import tempfile

    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    engine = build_engine(pathlib.Path(tempfile.mkdtemp()))
    with open(GOLDEN_PATH, "w") as f:
        json.dump(snapshot(engine), f, indent=1)
    print("wrote", GOLDEN_PATH)
