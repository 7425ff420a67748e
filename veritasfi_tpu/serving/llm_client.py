"""OpenAI-protocol chat client + in-memory fake for tests.

The reference talks to an external vLLM server through the openai SDK
(reference: src/utils/vllmManager.py:30-37). Here a thin first-party client
speaks the same protocol over httpx (sync + async, streaming SSE, function
calling), and ``FakeLLM`` implements the identical interface with scripted
responses so the whole serving stack is testable offline (the reference has
no mocks/fake backends at all — SURVEY.md §4).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Iterator, List, Optional, Union


# ---------------------------------------------------------------------------
# Response envelopes (the subset of the OpenAI schema the stack touches)
# ---------------------------------------------------------------------------
@dataclass
class ToolCallFunction:
    name: str
    arguments: str


@dataclass
class ToolCall:
    id: str
    function: ToolCallFunction
    type: str = "function"


@dataclass
class Message:
    role: str = "assistant"
    content: Optional[str] = None
    tool_calls: Optional[List[ToolCall]] = None
    # token logprobs when requested (HyDE perplexity eval, step1 parity)
    logprobs: Optional[List[float]] = None

    def to_dict(self) -> Dict[str, Any]:
        d: Dict[str, Any] = {"role": self.role, "content": self.content}
        if self.tool_calls:
            d["tool_calls"] = [
                {"id": t.id, "type": t.type,
                 "function": {"name": t.function.name,
                              "arguments": t.function.arguments}}
                for t in self.tool_calls
            ]
        return d


@dataclass
class Choice:
    message: Message
    delta: Optional[Message] = None
    finish_reason: Optional[str] = "stop"


@dataclass
class Usage:
    prompt_tokens: int = 0
    completion_tokens: int = 0
    total_tokens: int = 0


@dataclass
class ChatCompletion:
    choices: List[Choice]
    usage: Usage = field(default_factory=Usage)


def _parse_completion(data: Dict[str, Any]) -> ChatCompletion:
    choices = []
    for ch in data.get("choices", []):
        msg = ch.get("message") or {}
        tool_calls = None
        if msg.get("tool_calls"):
            tool_calls = [
                ToolCall(id=t["id"],
                         function=ToolCallFunction(
                             name=t["function"]["name"],
                             arguments=t["function"]["arguments"]))
                for t in msg["tool_calls"]
            ]
        logprobs = None
        lp = ch.get("logprobs")
        if lp and lp.get("content"):
            logprobs = [tok.get("logprob", 0.0) for tok in lp["content"]]
        choices.append(Choice(message=Message(
            role=msg.get("role", "assistant"),
            content=msg.get("content"),
            tool_calls=tool_calls,
            logprobs=logprobs)))
    usage = data.get("usage") or {}
    return ChatCompletion(choices=choices, usage=Usage(
        prompt_tokens=usage.get("prompt_tokens", 0),
        completion_tokens=usage.get("completion_tokens", 0),
        total_tokens=usage.get("total_tokens", 0)))


def _parse_stream_line(line: str) -> Optional[Choice]:
    line = line.strip()
    if not line.startswith("data:"):
        return None
    payload = line[len("data:"):].strip()
    if payload == "[DONE]":
        return None
    data = json.loads(payload)
    choices = data.get("choices") or []
    if not choices:
        # e.g. vLLM/OpenAI final usage chunk (stream_options include_usage)
        # or content-filter chunks — skip, don't kill the stream
        return None
    ch = choices[0]
    delta = ch.get("delta") or {}
    return Choice(message=Message(), delta=Message(
        role=delta.get("role", "assistant"), content=delta.get("content")),
        finish_reason=ch.get("finish_reason"))


# ---------------------------------------------------------------------------
# Real HTTP client
# ---------------------------------------------------------------------------
class LLMClient:
    """Sync + async OpenAI-protocol /chat/completions client."""

    def __init__(self, base_url: str, api_key: str = "EMPTY",
                 timeout: float = 120.0) -> None:
        import httpx

        self.base_url = base_url.rstrip("/")
        self._headers = {"Authorization": f"Bearer {api_key}",
                         "Content-Type": "application/json"}
        self._client = httpx.Client(timeout=timeout)
        self._aclient = httpx.AsyncClient(timeout=timeout)

    # -- sync -----------------------------------------------------------
    def chat(self, *, model: str, messages: List[Dict], temperature: float = 0.0,
             top_p: float = 0.8, stream: bool = False,
             tools: Optional[List[Dict]] = None,
             tool_choice: Optional[str] = None,
             **extra) -> Union[ChatCompletion, Iterator[Choice]]:
        body: Dict[str, Any] = {
            "model": model, "messages": messages,
            "temperature": temperature, "top_p": top_p, "stream": stream,
        }
        if tools:
            body["tools"] = tools
            body["tool_choice"] = tool_choice or "auto"
        body.update(extra)
        url = f"{self.base_url}/chat/completions"
        if not stream:
            resp = self._client.post(url, json=body, headers=self._headers)
            resp.raise_for_status()
            return _parse_completion(resp.json())
        return self._stream(url, body)

    def _stream(self, url: str, body: Dict) -> Iterator[Choice]:
        with self._client.stream("POST", url, json=body,
                                 headers=self._headers) as resp:
            resp.raise_for_status()
            for line in resp.iter_lines():
                choice = _parse_stream_line(line)
                if choice is not None:
                    yield choice

    # -- async ----------------------------------------------------------
    async def chat_async(self, *, model: str, messages: List[Dict],
                         temperature: float = 0.0, top_p: float = 0.8,
                         tools: Optional[List[Dict]] = None,
                         tool_choice: Optional[str] = None,
                         **extra) -> ChatCompletion:
        body: Dict[str, Any] = {
            "model": model, "messages": messages,
            "temperature": temperature, "top_p": top_p, "stream": False,
        }
        if tools:
            body["tools"] = tools
            body["tool_choice"] = tool_choice or "auto"
        body.update(extra)
        resp = await self._aclient.post(
            f"{self.base_url}/chat/completions", json=body,
            headers=self._headers)
        resp.raise_for_status()
        return _parse_completion(resp.json())

    def close(self) -> None:
        self._client.close()
        # the AsyncClient needs an async close; run it on a transient loop
        # (or best-effort skip if one is already running in this thread)
        import asyncio

        try:
            asyncio.run(self._aclient.aclose())
        except RuntimeError:
            pass


# ---------------------------------------------------------------------------
# Scripted fake
# ---------------------------------------------------------------------------
class FakeLLM:
    """In-memory LLM implementing the same chat/chat_async surface.

    ``responder(messages, **kwargs) -> str | Message`` decides the reply;
    by default it answers with a canned acknowledgement. Streaming yields
    the reply in small deltas using the reference's chunk framing.
    """

    def __init__(self, responder: Optional[Callable[..., Any]] = None,
                 stream_chunk: int = 8) -> None:
        self.responder = responder or (lambda messages, **kw: "OK")
        self.stream_chunk = stream_chunk
        # bounded call spy: tests inspect recent calls only; an unbounded
        # list pins every request's full prompt text (~29 KB/request — it
        # read as a server leak in the first soak run, RSS +66 MB/60 s)
        from collections import deque

        self.calls: "deque" = deque(maxlen=256)

    def _respond(self, messages, **kwargs) -> Message:
        out = self.responder(messages, **kwargs)
        if isinstance(out, Message):
            return out
        return Message(content=str(out))

    def chat(self, *, model: str, messages: List[Dict], stream: bool = False,
             **kwargs) -> Union[ChatCompletion, Iterator[Choice]]:
        self.calls.append({"messages": messages, "stream": stream, **kwargs})
        msg = self._respond(messages, **kwargs)
        if not stream:
            n = len(msg.content or "")
            return ChatCompletion(
                choices=[Choice(message=msg)],
                usage=Usage(total_tokens=max(n // 4, 1)))
        return self._stream_iter(msg)

    def _stream_iter(self, msg: Message) -> Iterator[Choice]:
        text = msg.content or ""
        for i in range(0, len(text), self.stream_chunk):
            yield Choice(message=Message(),
                         delta=Message(content=text[i:i + self.stream_chunk]),
                         finish_reason=None)
        yield Choice(message=Message(), delta=Message(content=None),
                     finish_reason="stop")

    async def chat_async(self, *, model: str, messages: List[Dict],
                         **kwargs) -> ChatCompletion:
        return self.chat(model=model, messages=messages, stream=False, **kwargs)

    def close(self) -> None:
        pass


class ProtocolResponder:
    """Protocol-faithful offline responder for FakeLLM: implements the wire
    contracts the serving stack parses (3-line rewrite, "ANSWER:" HyDE,
    merge, summary, final QA) without an external LLM server — used by the
    server stress harness and offline demos so the full RAG path (rewrite
    -> retrieve -> rerank -> answer) runs end-to-end.
    """

    _QUESTION_RE = re.compile(r"Question: (.*?)\n\nCurrent time:", re.S)

    def __init__(self, date: str = "2024-06-01", need_rag: bool = True):
        self.date = date
        self.need_rag = need_rag

    def __call__(self, messages, **kwargs):
        system = next((m["content"] for m in messages
                       if isinstance(m, dict) and m.get("role") == "system"),
                      "")
        user = next((m["content"] for m in reversed(messages)
                     if isinstance(m, dict) and m.get("role") == "user"), "")
        if "categorizes and rewrites user queries" in user or \
                "categorizes and rewrites user queries" in system:
            m = self._QUESTION_RE.search(user)
            question = m.group(1).strip() if m else user[:120]
            line3 = "YES" if self.need_rag else "NO"
            # " ||| " marks compound questions (stress harness's 80/15/5
            # sub-question mix, reference stress_theory.js:12-15): each part
            # becomes one rewritten sub-question, like the real rewrite LLM
            # splitting "A and also B"
            parts = [p.strip() for p in question.split("|||") if p.strip()]
            return (json.dumps(parts or [question]) + "\n" + self.date
                    + "\n" + line3)
        if "hypothetical answers" in system:
            return ("ANSWER: first hypothetical answer\n\n"
                    "ANSWER: second hypothetical answer\n\n"
                    "ANSWER: [Table Level] third")
        if "Combine them into one coherent reply" in system:
            return "Merged answer covering every sub-question."
        if "summarizes conversation history" in system:
            return "Summary of the conversation so far."
        return "Answer based on the provided context."
