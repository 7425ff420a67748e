"""Per-session agent: query preprocessing, HyDE, rerank, tool calls, chat,
answer merging, history.

Behavioral parity target: reference src/utils/vllmManager.py (ChatManager).
Protocol surfaces preserved exactly:
  * ``if_query_rag`` — strict 3-line response (JSON list of rewrittens /
    YYYY-MM-DD reference date / YES-NO need-RAG) parsed with
    ast.literal_eval, retry x3, fallback [question]/now/False
    (vllmManager.py:127-175);
  * HyDE split on "ANSWER:" with retry x3 and 30 s async timeout
    (vllmManager.py:233-290);
  * rerank fusion semantics via rerank.fusion (vllmManager.py:430-483);
  * one round of OpenAI function calling executing market-data tools
    (vllmManager.py:521-563);
  * 60 s chat timeout returning None (vllmManager.py:597-616);
  * Deepseek-style alternating history, 20-turn ring, interrupt-index
    truncation, runtime log (vllmManager.py:629-717).

TPU-native difference: the reranker is an injected ``scorer`` callable
backed by the continuous batcher (no global lock), and the similarity
matrix reuses retrieval embeddings via chunk ``_row`` tags.
"""

from __future__ import annotations

import ast
import asyncio
import json
import logging
import threading
from datetime import datetime
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..rerank.fusion import chunk_time_scores, rank_chunk
from ..utils.profiler import profiler
from . import prompts
from .prompts import CompanyProfile
from .tools import TOOLS_SCHEMA

logger = logging.getLogger(__name__)


class ChatManager:
    def __init__(
        self,
        session_id: str,
        llm,                         # LLMClient | FakeLLM
        model_name: str,
        scorer: Optional[Callable[[List[List[str]]], Sequence[float]]] = None,
        fused_scorer=None,           # (question, texts, emb) -> (scores, sim)
        chunk_topk: int = 5,
        rerank_max_candidates: Optional[int] = None,
        history_limit: int = 20,
        similar_threshold: float = 0.9,
        tools=None,                  # FinnhubTools | None
        tools_schema=None,
        company: CompanyProfile = CompanyProfile(),
        temperature: float = 0.0,
        top_p: float = 0.8,
        hyde_timeout_s: float = 30.0,
        chat_timeout_s: float = 60.0,
        num_hypo: int = 3,
        max_retry: int = 3,
    ) -> None:
        assert history_limit % 2 == 0, \
            "history_limit counts user+assistant turns, so it must be even"
        self.session_id = session_id
        self.llm = llm
        self.model_name = model_name
        self.scorer = scorer
        self.fused_scorer = fused_scorer
        self.chunk_topk = chunk_topk
        self.rerank_max_candidates = rerank_max_candidates
        self.history_limit = history_limit
        self.similar_threshhold = similar_threshold  # reference spelling
        self.tools = tools
        self.tools_schema = tools_schema if tools_schema is not None else TOOLS_SCHEMA
        self.company = company
        self.temperature = temperature
        self.top_p = top_p
        self.hyde_timeout_s = hyde_timeout_s
        self.chat_timeout_s = chat_timeout_s
        self.num_hypo = num_hypo
        self.max_retry = max_retry

        self.internal_assistant_message: List[Dict] = []
        self.chat_history: List[Dict] = []
        self.all_chat_history: List[Dict] = [
            {"role": "system", "content": prompts.get_sys_prompt(company)}
        ]

        # intermediate state, exposed via get_runtime_log
        self.need_rag = False
        self.rewrittens: List[str] = []
        self.query_time: datetime = datetime.now()
        self.hypo_chunks: List[List[str]] = []
        self.rag_info: List[Dict] = []
        self.all_retrieved_content: List = []
        self.qa_history: List[Dict] = []

        # background summary state
        self.summary_lock = threading.Lock()
        self.is_summarizing = False
        self.summary_event = threading.Event()
        self.history_summary = ""

    # ------------------------------------------------------------------
    def _chat(self, messages, stream=False, **kw):
        return self.llm.chat(model=self.model_name, messages=messages,
                             temperature=self.temperature, top_p=self.top_p,
                             stream=stream, **kw)

    async def _chat_async(self, messages, **kw):
        return await self.llm.chat_async(
            model=self.model_name, messages=messages,
            temperature=self.temperature, top_p=self.top_p, **kw)

    # ------------------------------------------------------------------
    @profiler.profile_function(name="rewrite")
    def if_query_rag(self, question: str, qa_history: str,
                     max_retry: Optional[int] = None) -> List[str]:
        """3-line rewrite/date/need-RAG protocol with bounded retries and the
        reference's safe fallback."""
        max_retry = self.max_retry if max_retry is None else max_retry
        for _ in range(max_retry):
            try:
                completion = self._chat([
                    {"role": "system",
                     "content": prompts.get_if_query_rag_prompt(
                         question=question, qa_history=qa_history,
                         company=self.company)},
                    {"role": "user", "content": question},
                ])
                try:
                    profiler.add_metric("rewrite_total_tokens",
                                        completion.usage.total_tokens)
                except Exception:
                    pass
                lines = completion.choices[0].message.content.strip().split("\n")
                assert len(lines) == 3, (
                    "rewrite protocol violated: want exactly 3 lines "
                    "(list / date / yes-no), got %d" % len(lines))
                self.rewrittens = ast.literal_eval(lines[0].strip())
                self.query_time = datetime.strptime(lines[1].strip(), "%Y-%m-%d")
                self.need_rag = "yes" in lines[2].strip().lower()
                assert isinstance(self.rewrittens, list) and self.rewrittens, \
                    "line 1 must literal-eval to a non-empty list of queries"
                break
            except Exception as e:
                logger.warning("rewrite attempt failed (%s); using the "
                               "safe fallback and retrying", e)
                self.need_rag = False
                self.rewrittens = [question]
                self.query_time = datetime.now()
                continue
        logger.info("Rewritten: %s need_rag=%s time=%s",
                    self.rewrittens, self.need_rag, self.query_time)
        return self.rewrittens

    def if_query_rag_json(self, question: str, qa_history: str,
                          max_retry: int = 1) -> List[str]:
        """JSON-schema rewrite variant for general financial QA datasets
        (reference: if_query_rag_financebench, vllmManager.py:177-230 —
        guided-JSON {mult_question, rewritten}; need_rag always True)."""
        prompt = (
            "You are a smart assistant that categorizes and rewrites "
            "questions. Determine whether the user's input contains more "
            "than one distinct question; split and rewrite each into a "
            "standalone English question incorporating context from the "
            "Q&A history.\n\n"
            f"Here is the Q&A history:\n{qa_history}\n\n"
            f"Question: {question}\n\n"
            "Respond with JSON of the form "
            '{"mult_question": true|false, "rewritten": ["..."]}')
        for _ in range(max_retry):
            try:
                completion = self._chat([
                    {"role": "system", "content": prompt},
                    {"role": "user", "content": question},
                ])
                data = json.loads(completion.choices[0].message.content)
                assert isinstance(data["rewritten"], list) and \
                    data["rewritten"]
                self.need_rag = True
                self.rewrittens = data["rewritten"]
                break
            except Exception as e:
                logger.warning("JSON rewrite attempt failed (%s)", e)
                # same safe fallback as if_query_rag: without it a parse
                # failure would return the PREVIOUS question's rewrittens
                # (or [] on a fresh manager, crashing every answer path)
                self.need_rag = True
                self.rewrittens = [question]
                continue
        return self.rewrittens

    # ------------------------------------------------------------------
    @profiler.profile_function(name="hyde")
    def generate_hypo_chunks(self, question: str,
                             max_retry: Optional[int] = None) -> List[str]:
        chunk_list: List[str] = []
        max_retry = self.max_retry if max_retry is None else max_retry
        for _ in range(max_retry):
            try:
                completion = self._chat([
                    {"role": "system",
                     "content": prompts.get_hypo_sys_prompt(self.num_hypo)},
                    {"role": "user", "content": question},
                ])
                try:
                    profiler.add_metric("hyde_tokens",
                                        completion.usage.total_tokens)
                except Exception:
                    pass
                text = completion.choices[0].message.content
                chunk_list = [c.strip() for c in text.split("ANSWER:")[1:]]
                break
            except Exception as e:
                logger.warning("HyDE generation attempt failed (%s)", e)
        return chunk_list

    async def generate_hypo_chunks_async(self, question: str,
                                         max_retry: int = 3) -> List[str]:
        chunk_list: List[str] = []
        for attempt in range(max_retry):
            try:
                completion = await asyncio.wait_for(
                    self._chat_async([
                        {"role": "system",
                         "content": prompts.get_hypo_sys_prompt(self.num_hypo)},
                        {"role": "user", "content": question},
                    ]),
                    timeout=self.hyde_timeout_s,
                )
                try:
                    profiler.add_metric("hyde_total_tokens",
                                        completion.usage.total_tokens)
                except Exception:
                    pass
                text = completion.choices[0].message.content
                chunk_list = [c.strip() for c in text.split("ANSWER:")[1:]]
                break
            except asyncio.TimeoutError:
                logger.warning("HyDE call hit its deadline (attempt %d/%d)",
                               attempt + 1, max_retry)
                await asyncio.sleep(0.5)
            except Exception as e:
                logger.warning("HyDE generation attempt failed (%s)", e)
                await asyncio.sleep(0.5)
        return chunk_list

    # ------------------------------------------------------------------
    def rank_chunk(self, chunks: List[Dict], question: str,
                   query_time, retriever) -> List[int]:
        """Cross-encoder + time-score fusion; returns selected bundle ids
        reversed (semantics: vllmManager.py:430-483)."""
        if not chunks:
            return []
        time_scores = chunk_time_scores(chunks, query_time)
        texts = [c["page_content"] for c in chunks]
        have_rows = all("_row" in c for c in chunks)
        if self.fused_scorer is not None and have_rows:
            # one device dispatch: cross-encoder scores + candidate cosine
            emb = retriever.corpus.embeddings[
                np.asarray([c["_row"] for c in chunks], np.int64)]
            reranker_scores, similar_mtx = self.fused_scorer(
                question, texts, emb)
        else:
            pairs = [[question, t] for t in texts]
            reranker_scores = np.asarray(self.scorer(pairs), np.float32)
            if have_rows:
                similar_mtx = retriever.compute_similarity_mtx_rows(
                    [c["_row"] for c in chunks])
            else:
                similar_mtx = retriever.compute_similarity_mtx(texts)
        return rank_chunk(chunks, reranker_scores, time_scores, similar_mtx,
                          chunk_topk=self.chunk_topk,
                          similar_threshold=self.similar_threshhold)

    # ------------------------------------------------------------------
    def chat_internal(self, user_input: str, rag_context: str = "",
                      rag_docu_time=None, lang: str = "en",
                      potential_qa=None, stream: bool = False,
                      internal_input: Optional[str] = None,
                      interrupt_index: Optional[int] = None):
        if interrupt_index is not None:
            self.modify_previous_assistant_message(interrupt_index)
        if internal_input:
            user_input = (f"[Internal Assistant Information]: {internal_input}"
                          f"\n\nUser Input: {user_input}")
        potential_qa = potential_qa if potential_qa is not None else [{}]
        user_message = {
            "role": "user",
            "content": prompts.get_qa_template(
                user_input, rag_context, lang,
                self.get_internal_assitant_message(), potential_qa,
                company=self.company),
        }
        time_info = (
            f"\nAt the end of your response, include only one sentence "
            f"stating that the information is based on knowledge available "
            f"before {rag_docu_time}, and ensure that the language used "
            f"remains consistent with previous responses."
            if rag_docu_time else "")

        self.chat_history.append(user_message)
        self.all_chat_history.append(user_message)
        # the reference grows these without bound (vllmManager.py:502-503;
        # save_chat_history/_trim are dead code there, the functional
        # history is the 20-turn qa ring). Cap them so a long-lived session
        # can't leak multi-KB templated prompts indefinitely — the cap is
        # far above anything form_chat_history/get_chat_history consume.
        if len(self.chat_history) > 200:
            del self.chat_history[:100]
        if len(self.all_chat_history) > 200:
            del self.all_chat_history[:100]

        messages = [{"role": "system",
                     "content": prompts.get_sys_prompt(self.company) + time_info}]
        messages.extend(self.form_chat_history())
        messages.append(user_message)
        return self._chat(messages, stream=stream)

    # ------------------------------------------------------------------
    async def process_tool_calls(self, messages: List[Dict], tools_schema):
        """One round of function calling; executes tools and appends tool
        results (vllmManager.py:521-563)."""
        response = await self._chat_async(messages, tools=tools_schema,
                                          tool_choice="auto")
        response_message = response.choices[0].message
        messages.append(response_message.to_dict())
        tool_calls = response_message.tool_calls

        if tool_calls and self.tools is not None:
            available = self.tools.registry()
            for tool_call in tool_calls:
                fn = available[tool_call.function.name]
                args = json.loads(tool_call.function.arguments)
                tool_output = fn(**args)
                messages.append({
                    "tool_call_id": tool_call.id,
                    "role": "tool",
                    "name": tool_call.function.name,
                    "content": json.dumps(tool_output),
                })
        return messages

    async def chat_async(self, user_input: str, rag_context: str = "",
                         rag_docu_time=None, lang: str = "en",
                         potential_qa=None) -> Tuple[str, object]:
        """Parity note: ``rag_docu_time`` is accepted but unused — the
        reference's time_info disclaimer is commented out in its async
        path (vllmManager.py:569-578); only chat_internal emits it."""
        potential_qa = potential_qa if potential_qa is not None else [{}]
        try:
            messages = [{"role": "system",
                         "content": prompts.get_sys_prompt(self.company)}]
            messages.extend(self.form_chat_history())
            messages.append({"role": "user", "content": user_input})

            messages = await self.process_tool_calls(
                list(messages), self.tools_schema)

            messages.append({
                "role": "user",
                "content": prompts.get_qa_template(
                    user_input, rag_context, lang,
                    self.get_internal_assitant_message(), potential_qa,
                    company=self.company),
            })
            response = await asyncio.wait_for(
                self._chat_async(messages), timeout=self.chat_timeout_s)
            try:
                profiler.add_metric("answer_sub_tokens",
                                    response.usage.total_tokens)
            except Exception:
                pass
            return user_input, response
        except asyncio.TimeoutError:
            logger.error("chat turn exceeded its deadline; question head: %s...",
                         user_input[:50])
            return user_input, None
        except Exception as e:
            logger.error("chat turn failed (%s); returning the apology "
                         "fallback", e)
            return user_input, None

    # ------------------------------------------------------------------
    @profiler.profile_function(name="final_answer")
    def modify_answer(self, answers: List[str], question: str,
                      rewrittens: List[str], stream: bool, lang: str,
                      max_retry: int = 3):
        qa_pairs = [
            f"Question: {rewrittens[i]}\nAnswer: {answers[i]}"
            for i in range(len(rewrittens)) if i < len(answers)
        ]
        qa_pairs_text = "\n\n".join(qa_pairs)
        for _ in range(max_retry):
            completion = self._chat([
                {"role": "system",
                 "content": prompts.get_modify_answer_prompt(
                     question, qa_pairs_text, lang)},
                {"role": "user",
                 "content": "Create a comprehensive answer based on the "
                            "provided information."},
            ], stream=stream)
            if stream:
                return completion
            merged = completion.choices[0].message.content.strip()
            try:
                profiler.add_metric("final_answer_tokens",
                                    completion.usage.total_tokens)
            except Exception:
                pass
            if merged:
                return merged
            logger.warning("answer-modification call returned empty text; "
                           "keeping the draft answer")
        return answers[0] if answers else ""

    def summarize_chat_history(self, chat_history: str,
                               max_retry: int = 3) -> str:
        summary = ""
        for _ in range(max_retry):
            completion = self._chat([
                {"role": "system",
                 "content": prompts.get_summary_prompt(chat_history)},
                {"role": "user",
                 "content": "Summarize the conversation history."},
            ])
            summary = completion.choices[0].message.content.strip()
            if summary:
                break
        return summary

    # ------------------------------------------------------------------
    # LLM-judge helpers (reference vllmManager.py:351-428)
    def evaluate(self, answer: str, expected_answer: str) -> Tuple[float, str]:
        prompt = (
            "You are a smart assistant that evaluates answers. Compare the "
            "given answer with the expected answer and assign a score from 0 "
            "to 1: 1 means it includes all the numbers and points of the "
            "expected answer; 0 means it is irrelevant or includes none of "
            "the key information; intermediate scores reflect partial "
            "coverage. Provide a brief explanation.\n\n"
            "Output your response in the following format:\n\n"
            "Score: [score]\nReason: [brief explanation]"
        )
        completion = self._chat([
            {"role": "system", "content": prompt},
            {"role": "user",
             "content": f"Answer: {answer}\nExpected Answer: {expected_answer}"},
        ])
        resp = completion.choices[0].message.content.strip()
        score = float(resp.split("Score:")[1].split("Reason:")[0].strip())
        reason = resp.split("Reason:")[1].strip()
        return score, reason

    def evaluate_chunk(self, chunk: str, question: str, exp_answer: str) -> bool:
        prompt = (
            "You are a smart assistant that determines whether the provided "
            "chunk of text is relevant for answering the 'Question' and "
            "contains key information needed to produce the 'Expected "
            "Answer'. Mark it relevant if it contains direct information, "
            "answers part of the question, or addresses any required aspect "
            "(financial metrics, strategy, positioning, operations, outlook, "
            "history, industry relationships).\n\n"
            "Response format:\nRelevance: [YES or NO]\nReason: [one sentence]"
        )
        flag = ""
        try_cnt = 3
        while try_cnt > 0 and flag not in ("YES", "NO"):
            completion = self._chat([
                {"role": "system", "content": prompt},
                {"role": "user",
                 "content": (f"Question: {question}\nExpected Answer: "
                             f"{exp_answer}\nChunk: {chunk}")},
            ])
            resp = completion.choices[0].message.content.strip()
            flag = resp.split("Relevance:")[1].split("Reason:")[0].strip()
            try_cnt -= 1
        return flag == "YES"

    # ------------------------------------------------------------------
    # history / state management (reference vllmManager.py:621-717)
    def add_internal_assitant_message(self, internal_input: str) -> None:
        self.internal_assistant_message.append({
            "Critical information": internal_input,
            "Time": datetime.now().strftime("%H-%M-%S"),
        })
        if len(self.internal_assistant_message) > 5:
            self.internal_assistant_message.pop(0)

    def get_internal_assitant_message(self) -> str:
        return str(self.internal_assistant_message)

    def add_to_qa_history(self, user_input: str, llm_response: str) -> None:
        self.qa_history.append({"user": user_input, "assistant": llm_response})
        if len(self.qa_history) > self.history_limit:
            self.qa_history.pop(0)

    def get_qa_history(self) -> str:
        return "".join(
            f"{{'User Question': '{qa['user']}'; 'LLM Answer': "
            f"'{qa['assistant']}'}}\n"
            for qa in self.qa_history
        )

    def form_chat_history(self) -> List[Dict]:
        history = []
        for qa in self.qa_history:
            history.append({"role": "user", "content": qa["user"]})
            history.append({"role": "assistant", "content": qa["assistant"]})
        return history

    def modify_previous_assistant_message(self, interrupt_index: int) -> None:
        # Parity note: in the live serving flow this is a no-op exactly as
        # in the reference (vllmManager.py:657-669) — chat_history only
        # ever holds user messages because save_chat_history's sole call
        # site is commented out there (vllmChatService.py:309), and even it
        # stores role "response", not "assistant". Kept verbatim as part of
        # the protocol surface.
        for message in reversed(self.chat_history):
            if message["role"] == "assistant":
                message["content"] = message["content"][:interrupt_index]
                break

    def save_chat_history(self, response: str) -> None:
        # dead in the reference serving flow (see modify_previous_... note);
        # the role-"response" quirk is reference-verbatim (vllmManager.py:673)
        assistant_message = {"role": "response", "content": response}
        self.chat_history.append(assistant_message)
        self.all_chat_history.append(assistant_message)
        self._trim_chat_history()

    def _trim_chat_history(self) -> None:
        # reference-verbatim, including its assumption that entry 0 is a
        # system message (it never is — vllmManager.py:678-681)
        non_system = [m for m in self.chat_history if m["role"] != "system"]
        if len(non_system) > self.history_limit:
            self.chat_history = ([self.chat_history[0]]
                                 + non_system[-self.history_limit:])

    def clear_chat_history(self) -> None:
        self.qa_history = []

    def reset_rag_info(self) -> None:
        self.rag_info = []

    def add_rag_info(self, sub_query: str, selected_chunks: List[Dict]) -> None:
        """Per-sub-question retrieval record (the reference accumulates a
        pandas DataFrame, vllmChatService.py:62-69; list-of-dicts here with
        the same fields)."""
        for c in selected_chunks:
            self.rag_info.append({
                "sub_query": sub_query,
                "timeinfo": c["metadata"].get("date_published", "N/A"),
                "chunk_id": c["metadata"]["doc_id"],
                "chunk_content": c["page_content"],
                "chunk_bundle_id": c["bundle_id"],
            })

    def get_history_summary(self) -> str:
        if self.is_summarizing:
            self.summary_event.wait()
        return self.history_summary

    def get_runtime_log(self) -> Dict:
        return {
            "session_id": self.session_id,
            "need_rag": self.need_rag,
            "rewrittens": self.rewrittens,
            "hypo_chunks": self.hypo_chunks,
            "rag_info": json.dumps(self.rag_info, ensure_ascii=False),
            "qa_history": self.qa_history,
            "all_retrieved_content": self.all_retrieved_content,
        }
