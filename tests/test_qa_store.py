from veritasfi_tpu.models.hash_embedder import HashEmbedder
from veritasfi_tpu.retrieval.qa_store import QAVectorStore

QA = [
    {"question": "What is the sales volume?",
     "question_rewritten": "What is the sales volume of Zeekr in 2024?",
     "data": {"Y2024_Q1": "30000"}},
    {"question": "Store count?",
     "question_rewritten": "How many Zeekr stores are there?",
     "data": {"Y2024_Q3": "400"}},
    {"question": "Revenue?",
     "question_rewritten": "What is Zeekr's revenue?",
     "data": {"Y2024_FY": "$7B"}},
]


def test_query_qa_returns_parsed_entries():
    store = QAVectorStore(HashEmbedder(dim=64).encode)
    store.load_qa_data(QA)
    res = store.query_qa("sales volume of Zeekr", n_results=2)
    assert len(res) == 2
    assert res[0]["question_rewritten"] == "What is the sales volume of Zeekr in 2024?"
    assert res[0]["data"] == {"Y2024_Q1": "30000"}
    assert res[0]["metadata"]["doc_id"] == "qa_0"


def test_prev_next_metadata():
    store = QAVectorStore(HashEmbedder(dim=64).encode)
    store.load_qa_data(QA)
    assert store.metadatas[0]["prev_chunk_id"] == ""
    assert store.metadatas[1]["prev_chunk_id"] == "qa_0"
    assert store.metadatas[-1]["next_chunk_id"] == ""


def test_persistence_roundtrip(tmp_path):
    d = str(tmp_path / "qa")
    store = QAVectorStore(HashEmbedder(dim=64).encode, persist_directory=d)
    store.load_qa_data(QA)
    reloaded = QAVectorStore(HashEmbedder(dim=64).encode, persist_directory=d)
    res = reloaded.query_qa("store count", n_results=1)
    assert res[0]["question_rewritten"] == "How many Zeekr stores are there?"


def test_empty_store():
    store = QAVectorStore(HashEmbedder(dim=64).encode)
    assert store.query_qa("anything") == []


def test_load_qa_data_failed_embed_leaves_store_clean():
    """An embed_fn failure mid-load must not leave ghost docs that
    misalign docs vs embeddings on retry."""
    import numpy as np
    import pytest as _pytest

    from veritasfi_tpu.retrieval.qa_store import QAVectorStore

    calls = {"n": 0}

    def flaky(texts):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("device OOM")
        out = np.zeros((len(texts), 8), np.float32)
        out[:, 0] = 1.0
        return out

    store = QAVectorStore(flaky)
    item = {"question": "q", "question_rewritten": "qr", "data": {"a": 1}}
    with _pytest.raises(RuntimeError):
        store.load_qa_data([item])
    assert store.docs == [] and store.embeddings is None
    store.load_qa_data([item])
    assert len(store.docs) == 1
    assert store.embeddings is not None and len(store.embeddings) == 1
    assert store.query_qa("q", 1)[0]["question"] == "q"
