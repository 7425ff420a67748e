"""HTTP server + stack composition tests (aiohttp test client).

pytest-asyncio is not in this image, so async bodies run via asyncio.run."""

import asyncio
import json

import numpy as np
import pytest

pytest.importorskip("aiohttp")
from aiohttp.test_utils import TestClient, TestServer

from fake_brain import ScriptedBrain
from test_chat_service import hash_scorer
from test_ensemble import EMB, make_corpus
from veritasfi_tpu.retrieval.ensemble import EnsembleRetriever
from veritasfi_tpu.serving.chat_service import ChatService
from veritasfi_tpu.serving.llm_client import FakeLLM
from veritasfi_tpu.serving.server import create_app


class MiniStack:
    def __init__(self, service):
        self.chat_service = service


@pytest.fixture
def service(tmp_path):
    idx, bm25 = make_corpus(tmp_path, seed=31)
    eng = EnsembleRetriever(idx, EMB.encode, bm25=bm25, k=4)
    brain = ScriptedBrain(rewrittens=["zeekr revenue question"])
    return ChatService(FakeLLM(brain), "m", [eng], hash_scorer)


async def make_client(aiohttp_like_app):
    server = TestServer(aiohttp_like_app)
    client = TestClient(server)
    await client.start_server()
    return client


def test_chat_async_endpoint(service):
    asyncio.run(_chat_async_endpoint(service))


async def _chat_async_endpoint(service):
    client = await make_client(create_app(MiniStack(service)))
    try:
        resp = await client.post("/v1/chat/async", json={
            "question": "what is zeekr revenue?", "session_id": "s1"})
        assert resp.status == 200
        data = await resp.json()
        assert data["answer"].startswith("ANSWER_TO[")
        assert data["rewrittens"] == ["zeekr revenue question"]
    finally:
        await client.close()


def test_stream_endpoint_sse(service):
    asyncio.run(_stream_endpoint_sse(service))


async def _stream_endpoint_sse(service):
    client = await make_client(create_app(MiniStack(service)))
    try:
        resp = await client.post("/v1/chat/stream", json={
            "question": "what is zeekr revenue?", "session_id": "s2"})
        assert resp.status == 200
        assert resp.headers["Content-Type"].startswith("text/event-stream")
        body = await resp.text()
        frames = [f for f in body.split("\n\n") if f.strip()]
        assert all(f.startswith("data: ") for f in frames)
        text = "".join(json.loads(f[6:])["response"] for f in frames)
        assert text.startswith("ANSWER_TO[")
    finally:
        await client.close()


def test_bearer_token(service):
    asyncio.run(_bearer_token(service))


async def _bearer_token(service):
    client = await make_client(create_app(MiniStack(service),
                                          bearer_token="secret"))
    try:
        resp = await client.get("/v1/health")
        assert resp.status == 401
        resp = await client.get("/v1/health",
                                headers={"Authorization": "Bearer secret"})
        assert resp.status == 200
        assert (await resp.json())["status"] == "ok"
    finally:
        await client.close()


def test_profiler_endpoint(service):
    asyncio.run(_profiler_endpoint(service))


async def _profiler_endpoint(service):
    client = await make_client(create_app(MiniStack(service)))
    try:
        resp = await client.get("/v1/profiler")
        assert resp.status == 200
        data = await resp.json()
        assert "durations" in data and "metrics" in data
    finally:
        await client.close()


def test_build_stack_with_fakes(tmp_path):
    """Full build_stack composition over a persisted collection."""
    import dataclasses

    from veritasfi_tpu.config import Config
    from veritasfi_tpu.engine import RAGEngine
    from veritasfi_tpu.models.reranker import DECODER_PRESETS
    from veritasfi_tpu.stack import build_stack

    # persist a collection first
    cfg = Config()
    cfg.persist_directory = str(tmp_path / "index")
    cfg.collection = "test"
    cfg.rerank.model_name = "tiny-test"
    from conftest import make_processed_file, synth_chunk

    src = tmp_path / "src"
    src.mkdir()
    make_processed_file(src / "a.json", "2024-01-01",
                        [synth_chunk(i, page=1) for i in range(8)])
    engine = RAGEngine(cfg, embed_fn=EMB.encode)
    engine.create_collection("test", str(src))

    brain = ScriptedBrain(rewrittens=["zeekr question"])
    stack = build_stack(cfg, llm=FakeLLM(brain), embed_fn=EMB.encode)
    try:
        answer, *_ = stack.chat_service.generate_response_async(
            "what about topic 3?", "s")
        assert answer.startswith("ANSWER_TO[")
    finally:
        stack.close()


def test_chat_sync_endpoint(service):
    asyncio.run(_chat_sync_endpoint(service))


async def _chat_sync_endpoint(service):
    client = await make_client(create_app(MiniStack(service)))
    try:
        resp = await client.post("/v1/chat", json={
            "question": "what is zeekr revenue?", "session_id": "sync1"})
        assert resp.status == 200
        data = await resp.json()
        assert data["answer"].startswith("ANSWER_TO[")
        # sync path runs HyDE, so the brain's ANSWER: response was requested
        assert data["rewrittens"] == ["zeekr revenue question"]
    finally:
        await client.close()


def test_malformed_requests_get_400(service):
    asyncio.run(_malformed_requests(service))


async def _malformed_requests(service):
    client = await make_client(create_app(MiniStack(service)))
    try:
        r = await client.post("/v1/chat", data=b"not json{",
                              headers={"Content-Type": "application/json"})
        assert r.status == 400
        r = await client.post("/v1/chat/async", json={"no_question": True})
        assert r.status == 400
        r = await client.post("/v1/chat/stream", json=["a", "list"])
        assert r.status == 400
    finally:
        await client.close()


def test_same_session_requests_serialize(service):
    """Two concurrent requests on one session must not interleave their
    ChatManager state (per-session lock)."""
    import threading

    results = []

    def call(q):
        out = service.generate_response_async(q, "same-session")
        results.append(out[0])

    t1 = threading.Thread(target=call, args=("zeekr revenue question",))
    t2 = threading.Thread(target=call, args=("zeekr margin question",))
    t1.start(); t2.start(); t1.join(60); t2.join(60)
    assert len(results) == 2 and all(results)
    # both turns recorded in qa_history, in some serial order
    mgr = service.get_or_create_chat_manager("same-session")
    assert len(mgr.qa_history) == 2


def test_protocol_responder_compound_split():
    """The ' ||| ' compound-question marker must yield one rewritten
    sub-question per part (soak harness's 80/15/5 mix rides on this)."""
    import json as _json

    from veritasfi_tpu.serving.llm_client import ProtocolResponder

    r = ProtocolResponder()
    user = ("You are an assistant that categorizes and rewrites user "
            "queries.\n\nQuestion: What was revenue? ||| What is "
            "guidance?\n\nCurrent time: now")
    out = r([{"role": "user", "content": user}])
    lines = out.split("\n")
    assert _json.loads(lines[0]) == ["What was revenue?",
                                     "What is guidance?"]
    single = r([{"role": "user", "content": user.replace(
        " ||| What is guidance?", "")}])
    assert _json.loads(single.split("\n")[0]) == ["What was revenue?"]
