"""Scripted FakeLLM responder implementing the reference's wire protocols
(3-line rewrite, ANSWER: HyDE, merge, summary, tool calls) for serving-layer
tests."""

import json

from veritasfi_tpu.serving.llm_client import Message, ToolCall, ToolCallFunction


class ScriptedBrain:
    def __init__(self, rewrittens=None, date="2024-06-01", need_rag=True,
                 call_tool=False):
        self.rewrittens = rewrittens
        self.date = date
        self.need_rag = need_rag
        self.call_tool = call_tool
        self.seen_contexts = []
        self.tool_results = []

    def __call__(self, messages, **kwargs):
        system = next((m["content"] for m in messages
                       if isinstance(m, dict) and m.get("role") == "system"), "")
        user = next((m["content"] for m in reversed(messages)
                     if isinstance(m, dict) and m.get("role") == "user"), "")

        if "categorizes and rewrites user queries" in system:
            rew = self.rewrittens or [user]
            line3 = "YES" if self.need_rag else "NO"
            return f"{json.dumps(rew)}\n{self.date}\n{line3}"

        if "hypothetical answers" in system:
            return ("ANSWER: first hypothetical answer\n\n"
                    "ANSWER: second hypothetical answer\n\n"
                    "ANSWER: [Table Level] third")

        if "Combine them into one coherent reply" in system:
            return "MERGED: " + user[:40]

        if "summarizes conversation history" in system:
            return "SUMMARY of the session"

        # tool round: messages were sent with tools=... kwarg
        if kwargs.get("tools") is not None:
            if self.call_tool and not self.tool_results:
                tc = ToolCall(id="call_1", function=ToolCallFunction(
                    name="get_stock_price", arguments='{"ticker": "ZK"}'))
                self.tool_results.append("issued")
                return Message(content=None, tool_calls=[tc])
            return Message(content=None, tool_calls=None)

        # final QA answer: record whether context was provided
        self.seen_contexts.append("Retrieved Context" in user)
        return f"ANSWER_TO[{user[:60]}]"
