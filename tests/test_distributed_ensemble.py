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


def test_engine_retriever_with_mesh(tmp_path):
    """RAGEngine factory passes a mesh through to the sharded engine."""
    from conftest import make_processed_file, synth_chunk
    from veritasfi_tpu.config import Config
    from veritasfi_tpu.engine import RAGEngine

    src = tmp_path / "src"
    src.mkdir()
    make_processed_file(src / "a.json", "2024-01-01",
                        [synth_chunk(i) for i in range(16)])
    cfg = Config()
    cfg.persist_directory = str(tmp_path / "idx")
    engine = RAGEngine(cfg, embed_fn=EMB.encode)
    engine.create_collection("c", str(src))
    mesh = make_mesh([("corpus", 8)])
    retriever = engine.create_retriever(4, "c", mesh=mesh)
    out = retriever.invoke("chunk 3 text topic", [])
    assert out and retriever.mesh is mesh
