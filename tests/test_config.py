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


def test_path_k():
    cfg = Config()
    cfg.retrieval.k = 10
    cfg.retrieval.faiss_k = 40
    assert cfg.retrieval.path_k() == (40, 10, 10)


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
