"""Distributed (mesh-sharded) ensemble must produce identical chunk lists
to the single-device engine."""

import numpy as np
import pytest

from test_ensemble import EMB, make_corpus, strip_rows
from veritasfi_tpu.parallel import make_mesh
from veritasfi_tpu.retrieval.ensemble import EnsembleRetriever


@pytest.mark.parametrize("expand", [False, True])
def test_distributed_matches_single(tmp_path, expand):
    idx, bm25 = make_corpus(tmp_path, seed=41)
    mesh = make_mesh([("corpus", 8)])
    single = EnsembleRetriever(idx, EMB.encode, bm25=bm25, k=6,
                               enable_expand=expand)
    dist = EnsembleRetriever(idx, EMB.encode, bm25=bm25, k=6,
                             enable_expand=expand, mesh=mesh)
    for q in ["zeekr revenue margin", "stores europe delivery",
              "w3 w17 w29"]:
        hyde = [f"hypothetical about {q}"]
        a = strip_rows(single.invoke(q, hyde))
        b = strip_rows(dist.invoke(q, hyde))
        assert len(a) == len(b), (len(a), len(b))
        for x, y in zip(a, b):
            assert x["retriever"] == y["retriever"]
            assert x["metadata"]["doc_id"] == y["metadata"]["doc_id"]
            assert x["bundle_id"] == y["bundle_id"]
            assert abs(x["score"] - y["score"]) < 1e-4


def test_distributed_no_titles(tmp_path):
    idx, bm25 = make_corpus(tmp_path, seed=42, title_frac=0.0)
    mesh = make_mesh([("corpus", 8)])
    dist = EnsembleRetriever(idx, EMB.encode, bm25=bm25, k=5, mesh=mesh)
    out = dist.invoke("zeekr revenue", [])
    assert out and all(c["retriever"] in ("FAISS", "BM25") for c in out)
