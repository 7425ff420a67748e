import asyncio
from datetime import datetime

import numpy as np
import pytest

from fake_brain import ScriptedBrain
from veritasfi_tpu.serving.chat_manager import ChatManager
from veritasfi_tpu.serving.llm_client import FakeLLM
from veritasfi_tpu.serving.tools import FinnhubTools


def manager(brain=None, **kw):
    brain = brain or ScriptedBrain()
    return ChatManager("s1", FakeLLM(brain), "test-model", **kw), brain


def test_if_query_rag_parses_protocol():
    cm, _ = manager(ScriptedBrain(rewrittens=["q1 rewritten", "q2 rewritten"],
                                  date="2024-03-05", need_rag=True))
    rew = cm.if_query_rag("q1 and q2?", "")
    assert rew == ["q1 rewritten", "q2 rewritten"]
    assert cm.need_rag is True
    assert cm.query_time == datetime(2024, 3, 5)


def test_if_query_rag_fallback_on_garbage():
    cm, _ = manager(ScriptedBrain())
    cm.llm = FakeLLM(lambda messages, **kw: "not the protocol")
    rew = cm.if_query_rag("original question", "")
    assert rew == ["original question"]
    assert cm.need_rag is False


def test_hyde_split():
    cm, _ = manager()
    chunks = cm.generate_hypo_chunks("what is revenue")
    assert len(chunks) == 3
    assert chunks[0] == "first hypothetical answer"
    chunks_async = asyncio.run(cm.generate_hypo_chunks_async("q"))
    assert chunks_async == chunks


def test_chat_internal_includes_context_and_time():
    brain = ScriptedBrain()
    cm, _ = manager(brain)
    resp = cm.chat_internal("what is margin", rag_context="Date Published: "
                            "2024-01-01; Chunk Content: margin was 13%",
                            rag_docu_time="2024-01-01", lang="English")
    assert resp.choices[0].message.content.startswith("ANSWER_TO[")
    # system message got the knowledge-cutoff sentence
    sys_msg = cm.llm.calls[-1]["messages"][0]["content"]
    assert "based on knowledge available before 2024-01-01" in sys_msg
    assert brain.seen_contexts == [True]


def test_chat_async_with_tools():
    brain = ScriptedBrain(call_tool=True)
    tools = FinnhubTools(api_key="k", http_get=lambda url, params: {
        "c": 30.0, "pc": 29.0, "d": 1.0, "dp": 3.4})
    cm, _ = manager(brain, tools=tools)
    user_input, resp = asyncio.run(cm.chat_async("stock price?", "", None,
                                                 "English"))
    assert user_input == "stock price?"
    assert resp.choices[0].message.content.startswith("ANSWER_TO[")
    # the tool result message was appended into the conversation
    tool_msgs = [m for m in cm.llm.calls[-1]["messages"]
                 if isinstance(m, dict) and m.get("role") == "tool"]
    assert tool_msgs and "30.0" in tool_msgs[0]["content"]


def test_modify_answer_merges():
    cm, _ = manager()
    merged = cm.modify_answer(["a1", "a2"], "orig?", ["q1", "q2"],
                              stream=False, lang="English")
    assert merged.startswith("MERGED:")


def test_qa_history_ring():
    cm, _ = manager(ScriptedBrain())
    for i in range(25):
        cm.add_to_qa_history(f"q{i}", f"a{i}")
    assert len(cm.qa_history) == 20
    assert cm.qa_history[0]["user"] == "q5"
    hist = cm.form_chat_history()
    assert hist[0] == {"role": "user", "content": "q5"}
    assert hist[1] == {"role": "assistant", "content": "a5"}


def test_interrupt_truncation():
    cm, _ = manager()
    cm.chat_history = [{"role": "user", "content": "q"},
                       {"role": "assistant", "content": "0123456789"}]
    cm.modify_previous_assistant_message(4)
    assert cm.chat_history[1]["content"] == "0123"


def test_internal_assistant_ring():
    cm, _ = manager()
    for i in range(7):
        cm.add_internal_assitant_message(f"info{i}")
    assert len(cm.internal_assistant_message) == 5
    assert "info2" in cm.get_internal_assitant_message()


def test_evaluate_parses_score():
    cm, _ = manager()
    cm.llm = FakeLLM(lambda messages, **kw:
                     "Score: 0.8\nReason: mostly complete")
    score, reason = cm.evaluate("a", "b")
    assert score == 0.8 and reason == "mostly complete"


def test_evaluate_chunk_yes_no():
    cm, _ = manager()
    cm.llm = FakeLLM(lambda messages, **kw:
                     "Relevance: YES\nReason: it answers the question")
    assert cm.evaluate_chunk("chunk", "q", "a") is True


def test_rank_chunk_uses_scorer_and_rows():
    chunks = [
        {"page_content": "long text " * 10, "bundle_id": 0, "_row": 0,
         "metadata": {"date_published": "2024-01-01", "global_id": 0,
                      "doc_id": "d0"}},
        {"page_content": "other text " * 10, "bundle_id": 1, "_row": 1,
         "metadata": {"date_published": "2024-01-01", "global_id": 1,
                      "doc_id": "d1"}},
    ]

    class R:
        def compute_similarity_mtx_rows(self, rows):
            return np.eye(len(rows), dtype=np.float32)

    cm, _ = manager(scorer=lambda pairs: [0.2, 0.9])
    sel = cm.rank_chunk(chunks, "q", datetime(2024, 1, 1), R())
    assert sel == [0, 1]  # ranked [1, 0], reversed


def test_runtime_log_shape():
    cm, _ = manager()
    cm.add_rag_info("sub q", [{
        "page_content": "text", "bundle_id": 3,
        "metadata": {"date_published": "2024-01-01", "doc_id": "d"}}])
    log = cm.get_runtime_log()
    assert set(log) == {"session_id", "need_rag", "rewrittens", "hypo_chunks",
                        "rag_info", "qa_history", "all_retrieved_content"}
    import json as _json

    assert _json.loads(log["rag_info"])[0]["chunk_bundle_id"] == 3


def test_rank_chunk_fused_scorer_path():
    chunks = [
        {"page_content": "long text " * 10, "bundle_id": 0, "_row": 0,
         "metadata": {"date_published": "2024-01-01", "global_id": 0,
                      "doc_id": "d0"}},
        {"page_content": "other text " * 10, "bundle_id": 1, "_row": 1,
         "metadata": {"date_published": "2024-01-01", "global_id": 1,
                      "doc_id": "d1"}},
    ]

    class R:
        class corpus:
            embeddings = np.eye(2, 8, dtype=np.float32)

    calls = []

    def fused(question, texts, emb):
        calls.append((question, len(texts), emb.shape))
        return np.asarray([0.2, 0.9], np.float32), np.eye(2, dtype=np.float32)

    cm, _ = manager(fused_scorer=fused)
    sel = cm.rank_chunk(chunks, "q", datetime(2024, 1, 1), R())
    assert sel == [0, 1]
    assert calls == [("q", 2, (2, 8))]


def test_if_query_rag_rejects_empty_list():
    """'[]' parses as a valid list but crashes every answer path —
    validation must route it to the [question] fallback."""
    cm, _ = manager(ScriptedBrain())
    cm.llm = FakeLLM(lambda messages, **kw: "[]\n2024-01-01\nYES")
    rew = cm.if_query_rag("original question", "")
    assert rew == ["original question"]


def test_if_query_rag_json_fallback_on_garbage():
    """The JSON variant must fall back to [question] like if_query_rag —
    not return the previous turn's rewrittens (or [] on a fresh manager)."""
    cm, _ = manager(ScriptedBrain())
    cm.llm = FakeLLM(lambda messages, **kw: "not json at all")
    rew = cm.if_query_rag_json("standalone question", "")
    assert rew == ["standalone question"]
    assert cm.need_rag is True


def test_chat_history_capped():
    cm, _ = manager(ScriptedBrain())
    for i in range(230):
        cm.chat_history.append({"role": "user", "content": f"x{i}"})
        cm.all_chat_history.append({"role": "user", "content": f"x{i}"})
    cm.chat_internal("question", "ctx", None, "English")
    assert len(cm.chat_history) <= 201
    assert len(cm.all_chat_history) <= 201
