import pytest

from veritasfi_tpu.config import Config, load_config


def test_defaults_preserve_reference_constants():
    cfg = Config()
    assert cfg.retrieval.depth == 2048
    assert cfg.retrieval.expand_trigger == 0.72
    assert cfg.retrieval.expand_accept == 0.66
    assert cfg.retrieval.expand_max_chunks == 4
    assert cfg.rerank.rerank_topk == 5
    assert cfg.rerank.batch_size == 8
    assert cfg.rerank.similar_threshold == 0.9
    assert cfg.memory_bank.seq_threshold == 0.55
    assert cfg.memory_bank.bm25_threshold == 3.0
    assert cfg.serving.session_timeout_s == 1800
    assert cfg.serving.history_limit == 20
    assert cfg.llm.temperature == 0.0 and cfg.llm.top_p == 0.8


def test_yaml_roundtrip(tmp_path):
    cfg = Config()
    cfg.retrieval.k = 40
    p = str(tmp_path / "c.yaml")
    cfg.save(p)
    loaded = Config.load(p)
    assert loaded == cfg


def test_reference_flat_yaml_compat(tmp_path):
    p = tmp_path / "ref.yaml"
    p.write_text(
        "persist_directory: ./db\n"
        "embeddings_model_name: BAAI/bge-m3\n"
        "llm_model_name: qwen\n"
        "llm_base_url: http://x/v1\n"
        "rerank_model: BAAI/bge-reranker-v2-gemma\n"
        "rerank_topk: 7\n"
    )
    cfg = Config.load(str(p))
    assert cfg.persist_directory == "./db"
    assert cfg.encoder.model_name == "BAAI/bge-m3"
    assert cfg.llm.model_name == "qwen"
    assert cfg.rerank.model_name == "BAAI/bge-reranker-v2-gemma"
    assert cfg.rerank.rerank_topk == 7


def test_unknown_key_rejected(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("no_such_key: 1\n")
    with pytest.raises(ValueError, match="Unknown config key"):
        Config.load(str(p))


def test_load_config_default():
    assert load_config(None) == Config()


def test_load_config_missing_path_raises():
    """A typo'd --config must fail fast, not silently serve all-default
    settings (wrong index dir, empty bearer token, ...)."""
    import pytest

    with pytest.raises(FileNotFoundError, match="no/such/file"):
        load_config("no/such/file.yaml")


def test_engine_corpus_shards_builds_mesh(tmp_path):
    """mesh.corpus_shards > 1 shards the retriever over the first N
    devices straight from Config (config-driven scale-out), bit-identical
    to single-chip results."""
    import sys

    sys.path.insert(0, "tests")
    from conftest import make_processed_file, synth_chunk
    from test_ensemble import EMB

    from veritasfi_tpu.engine import RAGEngine

    src = tmp_path / "src"
    src.mkdir()
    make_processed_file(src / "a.json", "2024-01-01",
                        [synth_chunk(i) for i in range(12)])
    cfg = Config()
    cfg.persist_directory = str(tmp_path / "idx")
    cfg.mesh.corpus_shards = 4
    engine = RAGEngine(cfg, embed_fn=EMB.encode)
    engine.create_collection("c", str(src))
    sharded = engine.create_retriever(4, "c")
    assert sharded.mesh is not None
    assert sharded.mesh.devices.size == 4
    cfg.mesh.corpus_shards = 1
    single = engine.create_retriever(4, "c")
    assert single.mesh is None
    q, hyde = "chunk 3 text topic", ["some hypothetical text"]
    a = [(c["page_content"], c["retriever"]) for c in single.invoke(q, hyde)]
    b = [(c["page_content"], c["retriever"]) for c in sharded.invoke(q, hyde)]
    assert a == b


def test_flat_and_nested_keys_coexist(tmp_path):
    """A reference flat key plus the nested section for the same group
    must merge regardless of YAML order (the flat key used to be dropped
    when the nested mapping came later)."""
    from veritasfi_tpu.config import Config

    p = tmp_path / "c.yaml"
    p.write_text(
        "rerank_topk: 7\n"
        "rerank:\n  batch_size: 4\n"
        "llm:\n  temperature: 0.3\n"
        "llm_base_url: http://example:9/v1\n")
    cfg = Config.load(str(p))
    assert cfg.rerank.rerank_topk == 7
    assert cfg.rerank.batch_size == 4
    assert cfg.llm.temperature == 0.3
    assert cfg.llm.base_url == "http://example:9/v1"


def test_nested_wins_over_flat_for_same_field(tmp_path):
    from veritasfi_tpu.config import Config

    p = tmp_path / "c.yaml"
    p.write_text("rerank_topk: 7\nrerank:\n  rerank_topk: 9\n")
    assert Config.load(str(p)).rerank.rerank_topk == 9
