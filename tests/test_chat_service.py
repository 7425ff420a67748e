"""End-to-end serving tests: full stack with FakeLLM, tiny corpus, tiny
reranker — all three answer paths."""

import json

import numpy as np
import pytest

from fake_brain import ScriptedBrain
from test_ensemble import EMB, make_corpus
from veritasfi_tpu.retrieval.ensemble import EnsembleRetriever
from veritasfi_tpu.retrieval.memory_bank import MemoryBank
from veritasfi_tpu.retrieval.qa_store import QAVectorStore
from veritasfi_tpu.serving.chat_service import (
    ChatService,
    get_rag_content,
    select_most_recent_time,
)
from veritasfi_tpu.serving.llm_client import FakeLLM


def hash_scorer(pairs):
    """Deterministic stand-in for the cross-encoder: lexical overlap."""
    out = []
    for q, p in pairs:
        qs, ps = set(q.lower().split()), set(p.lower().split())
        out.append(len(qs & ps) / max(len(qs), 1))
    return np.asarray(out, np.float32)


@pytest.fixture
def service(tmp_path):
    idx, bm25 = make_corpus(tmp_path, seed=11)
    eng = EnsembleRetriever(idx, EMB.encode, bm25=bm25, k=5)
    db = str(tmp_path / "fq.db")
    MemoryBank.create_db(db, [
        {"question": "margin?", "question_rewritten":
         "zeekr margin question", "answer": "margin is 13%"}])
    bank = MemoryBank(db, None)
    qa_store = QAVectorStore(EMB.encode)
    qa_store.load_qa_data([
        {"question": "stores", "question_rewritten": "zeekr stores europe",
         "data": {"Y2024_Q3": "400"}}])
    brain = ScriptedBrain(rewrittens=["zeekr revenue question rewritten"])
    svc = ChatService(
        FakeLLM(brain), "test-model", [eng], hash_scorer,
        memory_bank=bank, qa_store=qa_store, rerank_topk=5)
    svc._brain = brain
    return svc


def test_select_most_recent_time():
    assert select_most_recent_time(["2024-01-01", "2024-06-01",
                                    "2023-12-31"]) == "2024-06-01"


def test_sync_path(service):
    answer, _, rag_info, rewrittens, hypo, retrieved, history = (
        service.generate_response_with_rag("what is zeekr revenue?", "s1"))
    assert answer.startswith("ANSWER_TO[")
    assert rewrittens == ["zeekr revenue question rewritten"]
    assert retrieved and rag_info          # retrieval happened (need_rag)
    assert hypo and len(hypo[0]) == 3      # sync path generates HyDE
    assert "zeekr revenue question rewritten" in history


def test_async_path_single(service):
    answer, _, rag_info, rewrittens, hypo, retrieved, history = (
        service.generate_response_async("what is zeekr revenue?", "s2"))
    assert answer.startswith("ANSWER_TO[")
    assert retrieved
    assert hypo == [[]]                    # async path: HyDE disabled
    assert history[-1]["assistant"] == answer


def test_async_path_multi_merges(service):
    service._brain.rewrittens = ["zeekr revenue sub one",
                                 "zeekr stores sub two"]
    answer, *_ = service.generate_response_async("two things?", "s3")
    assert answer.startswith("MERGED:")


def test_async_no_rag(service):
    service._brain.need_rag = False
    answer, _, rag_info, _, _, retrieved, _ = (
        service.generate_response_async("hello", "s4"))
    assert answer.startswith("ANSWER_TO[")
    assert retrieved == [] and rag_info == []


def test_stream_path_sse_framing(service):
    frames = list(service.generate_response_async_stream(
        "what is zeekr revenue?", "s5"))
    assert frames, "stream yielded nothing"
    texts = []
    for f in frames:
        assert f.startswith("data: ") and f.endswith("\n\n")
        payload = json.loads(f[len("data: "):])
        assert "response" in payload
        texts.append(payload["response"])
    full = "".join(texts)
    assert full.startswith("ANSWER_TO[")
    # history committed after the stream finished
    cm = service.get_or_create_chat_manager("s5")
    assert cm.qa_history[-1]["assistant"] == full


def test_stream_path_multi_sub_merges(service):
    service._brain.rewrittens = ["sub one", "sub two"]
    frames = list(service.generate_response_async_stream("two?", "s6"))
    full = "".join(json.loads(f[6:])["response"] for f in frames)
    assert full.startswith("MERGED:")


def test_memory_bank_consult(service):
    pairs = service._consult_memory_bank("zeekr margin question")
    assert {"question": "zeekr margin question", "answer": "margin is 13%"} in pairs
    # vector store contributes too
    pairs2 = service._consult_memory_bank("zeekr stores europe")
    assert any(p["answer"] == {"Y2024_Q3": "400"} for p in pairs2)


def test_session_reuse_and_gc(service):
    m1 = service.get_or_create_chat_manager("same")
    m2 = service.get_or_create_chat_manager("same")
    assert m1 is m2
    service.api_chat_manager["same"]["timestamp"] -= __import__(
        "datetime").timedelta(seconds=9999)
    service.cleanup_old_sessions()
    assert "same" not in service.api_chat_manager


def test_background_summary(service):
    service.generate_response_async("what is zeekr revenue?", "s7")
    service.generate_chat_summary("s7")
    cm = service.get_or_create_chat_manager("s7")
    assert cm.get_history_summary() == "SUMMARY of the session"
    assert service.get_test_info("s7") == (None, True)


def test_rerank_candidate_cap(tmp_path):
    """With rerank_max_candidates set, only the first M retrieved chunks
    are scored (BASELINE config #3 top-50 shape); default is uncapped."""
    idx, bm25 = make_corpus(tmp_path, seed=61)
    eng = EnsembleRetriever(idx, EMB.encode, bm25=bm25, k=8)
    scored = []

    def counting_scorer(pairs):
        scored.append(len(pairs))
        return hash_scorer(pairs)

    brain = ScriptedBrain(rewrittens=["zeekr revenue question"])
    svc = ChatService(FakeLLM(brain), "m", [eng], counting_scorer,
                      rerank_max_candidates=5)
    svc.generate_response_async("revenue?", "s1")
    assert scored and all(n <= 5 for n in scored)


def test_async_path_fused_batcher_matches_classic(tmp_path):
    """The wave-batched single-readback serve path must produce the same
    answer and rag_info as the classic retrieve->rank_chunk leg when both
    use the same cross-encoder."""
    from veritasfi_tpu.models.encoder_reranker import EncoderReranker
    from veritasfi_tpu.retrieval.fused_serve import FusedServePath
    from veritasfi_tpu.serving.retrieval_batcher import RetrievalBatcher

    idx, bm25 = make_corpus(tmp_path, seed=13)
    reranker = EncoderReranker(preset="tiny-test", passage_max_length=64)
    eng = EnsembleRetriever(idx, EMB.encode, bm25=bm25, k=5)

    def scorer(pairs):
        rows = [reranker.encode_pair(q, p) for q, p in pairs]
        return reranker.score_tokens(rows)

    def fused_scorer(q, texts, emb):
        rows = reranker.encode_pairs_cached(q, texts)
        return reranker.score_and_sim(rows, emb)

    def mk(batcher):
        brain = ScriptedBrain(rewrittens=["zeekr revenue question rewritten"])
        return ChatService(
            FakeLLM(brain), "m", [eng], scorer, fused_scorer=fused_scorer,
            rerank_topk=5, rerank_max_candidates=12,
            retrieval_batcher=batcher)

    classic = mk(None)
    fsp = FusedServePath(idx, reranker, embed_fn=EMB.encode, bm25=bm25,
                         k=5, enable_expand=False, rerank_cap=12,
                         chunk_topk=5)
    rb = RetrievalBatcher(fsp, max_batch=4, max_wait_ms=5.0)
    fused = mk(rb)
    try:
        q = "what is zeekr revenue?"
        a1, _, info1, rew1, _, ret1, _ = classic.generate_response_async(q, "x")
        a2, _, info2, rew2, _, ret2, _ = fused.generate_response_async(q, "x")
        assert a1 == a2
        assert rew1 == rew2
        assert info1 == info2
        assert ([c["_row"] for c in ret1[0][:12]]
                == [c["_row"] for c in ret2[0]])
    finally:
        rb.close()


def test_async_sub_answer_timeout_degrades(service):
    """chat_async returns (q, None) on timeout/error (reference
    vllmManager.py:611-619); the gather path must degrade to an apology
    instead of dereferencing None (AttributeError -> HTTP 500)."""
    service._brain.rewrittens = ["zeekr revenue sub one",
                                 "zeekr stores sub two"]
    orig = service._brain.__call__.__func__ if hasattr(
        service._brain.__call__, "__func__") else None

    base_call = type(service._brain).__call__
    fired = []

    def failing(brain, messages, **kwargs):
        user = next((m["content"] for m in reversed(messages)
                     if isinstance(m, dict) and m.get("role") == "user"), "")
        if "sub two" in user and kwargs.get("tools") is None and \
                "Retrieved Context" in user:
            fired.append(True)
            raise RuntimeError("simulated LLM failure")
        return base_call(service._brain, messages, **kwargs)

    type(service._brain).__call__ = failing
    try:
        answer, *_ = service.generate_response_async("two things?", "s9")
    finally:
        type(service._brain).__call__ = base_call
    assert fired, "simulated failure never triggered — test is vacuous"
    assert answer.startswith("MERGED:")


def test_batcher_submit_after_close_raises(tmp_path):
    import pytest as _pytest

    from veritasfi_tpu.serving.retrieval_batcher import RetrievalBatcher

    class _Serve:
        def enqueue(self, *a):
            return ("out",)

        def _format(self, h):
            return ([], [], {})

    b = RetrievalBatcher(_Serve())
    b.close()
    with _pytest.raises(RuntimeError):
        b.submit("q", [], "2024-01-01")
