import asyncio
import json

import pytest

from veritasfi_tpu.serving.llm_client import (
    ChatCompletion,
    FakeLLM,
    Message,
    ToolCall,
    ToolCallFunction,
    _parse_completion,
    _parse_stream_line,
)


def test_parse_completion_with_tool_calls():
    data = {
        "choices": [{"message": {
            "role": "assistant", "content": None,
            "tool_calls": [{"id": "c1", "type": "function",
                            "function": {"name": "get_stock_price",
                                         "arguments": '{"ticker": "ZK"}'}}],
        }}],
        "usage": {"prompt_tokens": 10, "completion_tokens": 5,
                  "total_tokens": 15},
    }
    comp = _parse_completion(data)
    assert comp.usage.total_tokens == 15
    tc = comp.choices[0].message.tool_calls[0]
    assert tc.function.name == "get_stock_price"
    assert json.loads(tc.function.arguments) == {"ticker": "ZK"}


def test_parse_stream_line():
    line = 'data: {"choices": [{"delta": {"content": "hel"}}]}'
    choice = _parse_stream_line(line)
    assert choice.delta.content == "hel"
    assert _parse_stream_line("data: [DONE]") is None
    assert _parse_stream_line("") is None


def test_fake_llm_sync_and_usage():
    llm = FakeLLM(lambda messages, **kw: "the answer")
    out = llm.chat(model="m", messages=[{"role": "user", "content": "hi"}])
    assert out.choices[0].message.content == "the answer"
    assert out.usage.total_tokens >= 1
    assert llm.calls[0]["messages"][0]["content"] == "hi"


def test_fake_llm_stream_framing():
    llm = FakeLLM(lambda messages, **kw: "abcdefghij", stream_chunk=4)
    parts = [c.delta.content for c in
             llm.chat(model="m", messages=[], stream=True)
             if c.delta and c.delta.content]
    assert "".join(parts) == "abcdefghij"
    assert len(parts) == 3


def test_fake_llm_async():
    llm = FakeLLM(lambda messages, **kw: "async answer")
    out = asyncio.run(llm.chat_async(model="m", messages=[]))
    assert out.choices[0].message.content == "async answer"


def test_fake_llm_message_responder():
    tc = ToolCall(id="t1", function=ToolCallFunction(
        name="get_ipo_info", arguments='{"ticker": "ZK"}'))
    llm = FakeLLM(lambda messages, **kw: Message(tool_calls=[tc]))
    out = llm.chat(model="m", messages=[])
    assert out.choices[0].message.tool_calls[0].id == "t1"
    d = out.choices[0].message.to_dict()
    assert d["tool_calls"][0]["function"]["name"] == "get_ipo_info"
