"""Local JAX chat backend with the OpenAI-protocol client surface.

Drop-in replacement for serving.llm_client.LLMClient backed by the
in-process Flax decoder + KV-cached generator (models/generate.py) instead
of an external vLLM server — the optional JAX inference backend from
SURVEY.md §7.4. Weights convert from a local HF Gemma-family checkpoint;
without one, the backend runs random weights (useful for load tests and
plumbing verification, not for answer quality).
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, List, Optional, Union

from ..models.generate import Generator
from .llm_client import ChatCompletion, Choice, Message, Usage

_DEFAULT_TEMPLATE = {
    "system": "<system>\n{content}\n</system>\n",
    "user": "<user>\n{content}\n</user>\n",
    "assistant": "<assistant>\n{content}\n</assistant>\n",
    "tool": "<tool>\n{content}\n</tool>\n",
    "generation_prefix": "<assistant>\n",
}


class LocalChatBackend:
    """chat()/chat_async() over the in-process generator."""

    def __init__(self, reranker_or_module, params: Optional[Any] = None,
                 tokenizer=None, max_new_tokens: int = 256,
                 max_prompt_len: int = 1024, eos_id: Optional[int] = None,
                 template: Optional[Dict[str, str]] = None,
                 stream_chunk: int = 8,
                 continuous_batching: bool = False, slots: int = 4,
                 window: int = 1024, decode_chunk: int = 8,
                 spec_lookup_k: int = 0, mesh=None) -> None:
        """``continuous_batching``: serve generations through a
        GenerationServer — concurrent chat() calls share decode steps in
        one device program (slot-based, rolling KV window) instead of
        serializing whole generations (serving/generation_server.py).
        ``spec_lookup_k``/``mesh`` pass through to the server: in-program
        prompt-lookup speculation (pays on quote-heavy RAG answers) and
        tensor-parallel slot caches over a device mesh."""
        # accept either a CrossEncoderReranker-style wrapper (module, params,
        # tokenizer) or a raw module + params + tokenizer
        if hasattr(reranker_or_module, "module"):
            wrapper = reranker_or_module
            module = wrapper.module
            params = params if params is not None else wrapper.params
            tokenizer = tokenizer if tokenizer is not None else wrapper.tokenizer
        else:
            module = reranker_or_module
        self.module = module
        self.tokenizer = tokenizer
        self.template = template or _DEFAULT_TEMPLATE
        self.stream_chunk = stream_chunk
        self.max_new_tokens = max_new_tokens
        self.generator = Generator(module, params,
                                   max_prompt_len=max_prompt_len,
                                   max_new_tokens=max_new_tokens)
        self.server = None
        if continuous_batching:
            from .generation_server import GenerationServer

            self.server = GenerationServer(
                module, params, slots=slots, window=window,
                chunk=decode_chunk, max_prompt_len=max_prompt_len,
                spec_lookup_k=spec_lookup_k, mesh=mesh)
        hf = getattr(tokenizer, "hf", None)
        if eos_id is not None:
            self.eos_id = eos_id
        elif hf is not None and hf.eos_token_id is not None:
            self.eos_id = hf.eos_token_id
        else:
            self.eos_id = module.arch.eos_id

    # -- text <-> tokens -------------------------------------------------
    def _encode(self, text: str) -> List[int]:
        hf = getattr(self.tokenizer, "hf", None)
        if hf is not None:
            return hf(text, add_special_tokens=False)["input_ids"]
        from ..models.tokenizer import basic_tokens

        return [self.tokenizer.token_id(t) for t in basic_tokens(text)]

    def _decode(self, tokens: List[int]) -> str:
        hf = getattr(self.tokenizer, "hf", None)
        if hf is not None:
            return hf.decode(tokens, skip_special_tokens=True)
        # hash tokenizer is not invertible; emit token ids (plumbing mode)
        return " ".join(f"<{t}>" for t in tokens)

    def render_prompt(self, messages: List[Dict]) -> List[int]:
        parts = []
        for m in messages:
            role = m.get("role", "user")
            tpl = self.template.get(role, self.template["user"])
            parts.append(tpl.format(content=m.get("content") or ""))
        parts.append(self.template["generation_prefix"])
        bos = ([self.module.arch.bos_id]
               if getattr(self.module.arch, "add_bos", True) else [])
        return bos + self._encode("".join(parts))

    # -- OpenAI-protocol surface -----------------------------------------
    def chat(self, *, model: str, messages: List[Dict],
             temperature: float = 0.0, top_p: float = 0.8,
             stream: bool = False, **kwargs
             ) -> Union[ChatCompletion, Iterator[Choice]]:
        max_new = kwargs.pop("max_tokens", None) or self.max_new_tokens
        if kwargs.get("tools"):
            # protocol-honest: this backend has no function calling — a
            # silently-None tool_calls response would make tool execution
            # never happen with no signal
            import logging

            logging.getLogger(__name__).warning(
                "LocalChatBackend ignores tools/tool_choice "
                "(no function calling in the local backend)")
        prompt = self.render_prompt(messages)
        if stream:
            return self._stream_iter(prompt, temperature, top_p, max_new)
        if self.server is not None:
            tokens = self.server.generate(prompt,
                                          max_new_tokens=max_new,
                                          eos_id=self.eos_id,
                                          temperature=temperature,
                                          top_p=top_p)
        else:
            tokens = self.generator.generate_tokens(
                [prompt], max_new_tokens=max_new, temperature=temperature,
                top_p=top_p, eos_id=self.eos_id)[0]
        text = self._decode(tokens)
        finish = "length" if len(tokens) >= max_new else "stop"
        return ChatCompletion(
            choices=[Choice(message=Message(content=text),
                            finish_reason=finish)],
            usage=Usage(prompt_tokens=len(prompt),
                        completion_tokens=len(tokens),
                        total_tokens=len(prompt) + len(tokens)))

    def _stream_iter(self, prompt: List[int], temperature: float,
                     top_p: float, max_new: Optional[int] = None
                     ) -> Iterator[Choice]:
        """True incremental streaming: tokens decode as they are sampled;
        deltas are the text suffix new since the last yield. Partial
        multi-byte characters (byte-fallback tokens decoding to a trailing
        U+FFFD) are HELD BACK until the character completes — emitting the
        placeholder would permanently desync deltas when the real character
        replaces it (HF TextStreamer's hold-back rule)."""
        max_new = max_new or self.max_new_tokens
        if self.server is not None:
            source = self.server.stream(prompt,
                                        max_new_tokens=max_new,
                                        eos_id=self.eos_id,
                                        temperature=temperature,
                                        top_p=top_p)
        else:
            source = self.generator.generate_stream(
                prompt, max_new_tokens=max_new, temperature=temperature,
                top_p=top_p, eos_id=self.eos_id)
        tokens: List[int] = []
        emitted = ""
        for tok in source:
            tokens.append(tok)
            text = self._decode(tokens)
            if text.endswith("\ufffd"):
                continue    # incomplete multi-byte char — hold back
            if len(text) > len(emitted):
                yield Choice(message=Message(),
                             delta=Message(content=text[len(emitted):]),
                             finish_reason=None)
                emitted = text
        finish = "length" if len(tokens) >= max_new else "stop"
        yield Choice(message=Message(), delta=Message(content=None),
                     finish_reason=finish)

    async def chat_async(self, *, model: str, messages: List[Dict],
                         **kwargs) -> ChatCompletion:
        """Runs the blocking generation in a worker thread: a zero-await
        coroutine would pin the event loop — asyncio.wait_for timeouts
        could never fire, and concurrent sessions would serialize instead
        of sharing GenerationServer decode steps."""
        import asyncio

        return await asyncio.to_thread(
            self.chat, model=model, messages=messages, stream=False,
            **kwargs)

    def close(self) -> None:
        if self.server is not None:
            self.server.close()
