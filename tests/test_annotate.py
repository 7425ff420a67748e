"""LLM auto-annotation -> reranker training groups."""

from veritasfi_tpu.evals.annotate import (
    annotate_chunk,
    load_groups,
    mine_training_groups,
    save_groups,
)
from veritasfi_tpu.serving.llm_client import FakeLLM


def relevance_brain(messages, **kw):
    system = messages[0]["content"]
    # label relevant iff the chunk mentions 'revenue'
    chunk = system.split("Chunk:")[1]
    yes = "revenue" in chunk.lower()
    return f"Relevance: {'YES' if yes else 'NO'}\nReason: lexical rule"


def test_annotate_chunk():
    llm = FakeLLM(relevance_brain)
    assert annotate_chunk(llm, "m", "q", "revenue was 300M") is True
    assert annotate_chunk(llm, "m", "q", "the cat sat") is False


def test_annotate_retry_none():
    llm = FakeLLM(lambda messages, **kw: "garbage output")
    assert annotate_chunk(llm, "m", "q", "chunk") is None


def test_mine_training_groups(tmp_path):
    llm = FakeLLM(relevance_brain)
    samples = [{
        "question": "What was Zeekr's revenue?",
        "candidates": ["revenue was 300M", "revenue grew 20%",
                       "the cat sat", "dogs bark", "weather is fine"],
    }]
    groups = mine_training_groups(samples, llm, "m", group_size=4)
    assert len(groups) == 2  # one group per positive
    for query, passages in groups:
        assert len(passages) == 4
        assert "revenue" in passages[0]
        assert all("revenue" not in p for p in passages[1:])

    # anonymized stage-1 variant
    anon = mine_training_groups(samples, llm, "m", group_size=4,
                                anonymize=True)
    assert all("zeekr" not in q.lower() for q, _ in anon)

    p = str(tmp_path / "groups.jsonl")
    save_groups(groups, p)
    assert load_groups(p) == groups

    # on-disk contract = FlagEmbedding JSONL, exactly what
    # `cli train-reranker --data` parses: pos is a LIST, negatives under
    # 'neg' (a {pos: str, negs: []} row would silently train on the first
    # CHARACTER of the positive and find zero negatives)
    import json as _json
    with open(p, encoding="utf-8") as f:
        row = _json.loads(f.readline())
    assert isinstance(row["pos"], list) and row["pos"]
    assert "neg" in row and isinstance(row["neg"], list)
    assert ([row["pos"][0]] + row["neg"])[:4] == list(groups[0][1])


def test_mine_skips_unlabelable():
    llm = FakeLLM(lambda messages, **kw: "Relevance: NO\nReason: none")
    groups = mine_training_groups(
        [{"question": "q", "candidates": ["a", "b"]}], llm, "m")
    assert groups == []  # no positives -> skipped
