"""Distributed (mesh-sharded) ensemble must produce identical chunk lists
to the single-device engine."""

import numpy as np
import pytest

from test_ensemble import EMB, make_corpus, strip_rows
from veritasfi_tpu.ingest.contract import ChunkRecord, hash_content
from veritasfi_tpu.ingest.corpus import build_corpus_index
from veritasfi_tpu.models.hash_embedder import HashEmbedder
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


def test_sharded_invoke_batch_matches_invoke():
    """invoke_batch under a corpus mesh (per-request ts_rows through
    distributed_fused_search) must equal sequential invoke — including the
    title path, which has no ts_dense object under a mesh."""
    import jax

    from veritasfi_tpu.parallel import make_mesh

    emb = HashEmbedder(dim=64)
    records = []
    for i in range(96):
        content = f"chunk {i}: metric{i % 13} quarter growth value{i % 7}"
        records.append(ChunkRecord(
            content=content, filename=f"f{i % 4}.json", page_number=i + 1,
            date_published="2024-01-15", doc_id=hash_content(content),
            global_id=i, title_summary=f"Topic {i % 9}"))
    titles = sorted({r.title_summary for r in records})
    index = build_corpus_index(records, titles, embed_fn=emb.encode)
    mesh = make_mesh([("corpus", len(jax.devices()))])
    eng = EnsembleRetriever(index, emb.encode, k=4, mesh=mesh)
    requests = [(f"metric{i} quarter", [f"growth value{i}"])
                for i in range(3)]
    batched = eng.invoke_batch(requests)
    serial = [eng.invoke(q, h) for q, h in requests]
    assert [[c["_row"] for c in r] for r in batched] == \
           [[c["_row"] for c in r] for r in serial]


def test_distributed_topk_dcn_ici_tuple_axis():
    """2D ('dcn', 'corpus') sharding merges identically to 1D."""
    import jax
    import jax.numpy as jnp

    from veritasfi_tpu.ops.topk import dense_topk
    from veritasfi_tpu.parallel import make_mesh
    from veritasfi_tpu.parallel.mesh import distributed_topk, shard_corpus

    n_dev = len(jax.devices())
    if n_dev % 2:
        return
    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(n_dev * 16, 32)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    q = rng.normal(size=(3, 32)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    mesh = make_mesh([("dcn", 2), ("corpus", n_dev // 2)])
    arr, n = shard_corpus(corpus, mesh, axis=("dcn", "corpus"))
    s_d, i_d = distributed_topk(arr, jnp.asarray(q), 8, mesh, n,
                                axis=("dcn", "corpus"))
    s_1, i_1 = dense_topk(jnp.asarray(corpus), jnp.asarray(q), 8)
    np.testing.assert_array_equal(np.asarray(i_d), np.asarray(i_1))
