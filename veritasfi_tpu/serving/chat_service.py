"""ChatService — session-oriented serving/orchestration layer.

Behavioral parity target: reference src/utils/vllmChatService.py:
  * session map with timestamps, 1800 s timeout sweep (:76-134);
  * memory-bank consultation combining BM25-priority + SequenceMatcher with
    seen-id dedup, then the vector QA store deduped by rewritten question
    (:151-248, :372-393);
  * three answer paths — sync per-sub-question loop
    (generate_response_with_rag, :251-337), async gather of sub-question
    chats (generate_response_async, :339-451), and an SSE streaming
    generator framing "data: {json}\\n\\n" (:453-575);
  * get_rag_content formatting and rag_info accumulation (:31-70);
  * background summary thread (:577-604) and get_test_info (:606-613).

TPU-native differences: the shared reranker runs behind the continuous
batcher instead of a global lock, and similarity matrices reuse retrieval
embeddings.
"""

from __future__ import annotations

import asyncio
import json
import logging
import re
import threading
from datetime import datetime, timedelta
from typing import Dict, List, Optional, Tuple

from ..rerank.fusion import select_content
from ..utils.profiler import profiler
from .chat_manager import ChatManager
from .prompts import CompanyProfile

logger = logging.getLogger(__name__)

_CJK_RE = re.compile(r"[一-鿿]")


def select_most_recent_time(time_info: List[str]) -> str:
    """Most recent date of the used chunks (vllmChatService.py:24-29)."""
    dates = [datetime.strptime(d, "%Y-%m-%d") for d in time_info]
    return max(dates).strftime("%Y-%m-%d")


@profiler.profile_function(name="rerank")
def get_rag_content(chat_manager: ChatManager, chunks: List[Dict],
                    rewritten_question: str, query_time, retriever,
                    min_bundle_chars: int = 50) -> Tuple[str, List[str]]:
    """rank -> bundle filter -> document-order context string
    (vllmChatService.py:31-70)."""
    cap = chat_manager.rerank_max_candidates
    if cap is not None and len(chunks) > cap:
        chunks = chunks[:cap]
    top_bundle_id = chat_manager.rank_chunk(
        chunks, rewritten_question, query_time, retriever)
    rag_content, time_info_list, selected_chunks = select_content(
        chunks, top_bundle_id, min_bundle_chars=min_bundle_chars)
    chat_manager.add_rag_info(rewritten_question, selected_chunks)
    return rag_content, time_info_list


class ChatService:
    def __init__(
        self,
        llm,                              # LLMClient | FakeLLM
        model_name: str,
        retrievers: List,                 # EnsembleRetriever list
        scorer,                           # pairs -> scores (batcher-backed)
        fused_scorer=None,                # (q, texts, emb) -> (scores, sim)
        memory_bank=None,                 # MemoryBank | None
        qa_store=None,                    # QAVectorStore | None
        rerank_topk: int = 5,
        rerank_max_candidates=None,
        session_timeout: int = 1800,
        company: CompanyProfile = CompanyProfile(),
        tools=None,
        seq_threshold: float = 0.55,
        bm25_threshold: float = 3.0,
        db_top_n: int = 2,
        table_top_n: int = 3,
        vector_top_n: int = 2,
        # The reference generates HyDE chunks in the sync path
        # (vllmChatService.py:279) but disabled it in the async/stream
        # paths (:371); use_hyde controls the sync path only.
        use_hyde: bool = True,
        retrieval_batcher=None,           # RetrievalBatcher | None
        # per-manager knobs forwarded to ChatManager (config.llm /
        # config.serving / config.rerank fields)
        history_limit: int = 20,
        num_hypo: int = 3,
        temperature: float = 0.0,
        top_p: float = 0.8,
        hyde_timeout_s: float = 30.0,
        chat_timeout_s: float = 60.0,
        max_retry: int = 3,
        similar_threshold: float = 0.9,
        min_bundle_chars: int = 50,
    ) -> None:
        self.llm = llm
        self.model_name = model_name
        self.retrievers = retrievers
        self.scorer = scorer
        self.fused_scorer = fused_scorer
        self.memory_bank = memory_bank
        self.qa_store = qa_store
        self.rerank_topk = rerank_topk
        self.rerank_max_candidates = rerank_max_candidates
        self.session_timeout = session_timeout
        self.company = company
        self.tools = tools
        self.seq_threshold = seq_threshold
        self.bm25_threshold = bm25_threshold
        self.db_top_n = db_top_n
        self.table_top_n = table_top_n
        self.vector_top_n = vector_top_n
        self.use_hyde = use_hyde
        self.retrieval_batcher = retrieval_batcher
        self.history_limit = history_limit
        self.num_hypo = num_hypo
        self.temperature = temperature
        self.top_p = top_p
        self.hyde_timeout_s = hyde_timeout_s
        self.chat_timeout_s = chat_timeout_s
        self.max_retry = max_retry
        self.similar_threshold = similar_threshold
        self.min_bundle_chars = min_bundle_chars

        self.api_chat_manager: Dict[str, Dict] = {}
        self.api_chat_manager_lock = threading.Lock()

    # ------------------------------------------------------------------
    def cleanup_old_sessions(self) -> None:
        now = datetime.now()
        timeout = timedelta(seconds=self.session_timeout)
        with self.api_chat_manager_lock:
            expired = [sid for sid, data in self.api_chat_manager.items()
                       if now - data["timestamp"] > timeout]
            for sid in expired:
                del self.api_chat_manager[sid]
                logger.info("Removed expired session %s", sid)

    def _session_lock(self, session_id: str) -> threading.Lock:
        self.get_or_create_chat_manager(session_id)   # ensure entry exists
        with self.api_chat_manager_lock:
            return self.api_chat_manager[session_id]["lock"]

    def get_or_create_chat_manager(self, session_id: str) -> ChatManager:
        with self.api_chat_manager_lock:
            if session_id not in self.api_chat_manager:
                manager = ChatManager(
                    session_id, self.llm, self.model_name,
                    scorer=self.scorer, fused_scorer=self.fused_scorer,
                    chunk_topk=self.rerank_topk,
                    rerank_max_candidates=self.rerank_max_candidates,
                    tools=self.tools, company=self.company,
                    history_limit=self.history_limit,
                    num_hypo=self.num_hypo,
                    temperature=self.temperature, top_p=self.top_p,
                    hyde_timeout_s=self.hyde_timeout_s,
                    chat_timeout_s=self.chat_timeout_s,
                    max_retry=self.max_retry,
                    similar_threshold=self.similar_threshold)
                self.api_chat_manager[session_id] = {
                    "manager": manager, "timestamp": datetime.now(),
                    # serializes same-session requests: parallel handlers
                    # sharing one ChatManager race on reset_rag_info /
                    # rag_info / qa_history otherwise
                    "lock": threading.Lock()}
            else:
                self.api_chat_manager[session_id]["timestamp"] = datetime.now()
        return self.api_chat_manager[session_id]["manager"]

    # ------------------------------------------------------------------
    def _combine_matches(self, bm25_results, sequence_results,
                         top_n: int) -> Tuple[bool, List[Dict]]:
        """BM25 results take priority; SequenceMatcher fills in, deduped by
        row id (vllmChatService.py:163-194)."""
        combined, seen_ids = [], set()
        for match in bm25_results:
            seen_ids.add(match[0])
            combined.append(match)
        for match in sequence_results:
            if match[0] not in seen_ids:
                seen_ids.add(match[0])
                combined.append(match)
        top = combined[:top_n]
        if top:
            return True, [{"question": m[2], "answer": m[3]} for m in top]
        return False, []

    def get_similar_questions_db(self, question: str, top_n: int = 5
                                 ) -> Tuple[bool, List[Dict]]:
        if self.memory_bank is None or not self.memory_bank.db_path:
            return False, []
        try:
            seq = self.memory_bank.find_similar_questions_db(
                question, top_n=self.db_top_n, threshold=self.seq_threshold)
            bm = self.memory_bank.find_similar_questions_bm25_db(
                question, top_n=self.db_top_n, threshold=self.bm25_threshold)
            return self._combine_matches(bm, seq, top_n)
        except Exception:
            logger.error("Error searching for similar questions", exc_info=True)
            return False, []

    def get_similar_questions_table(self, question: str, top_n: int = 5
                                    ) -> Tuple[bool, List[Dict]]:
        if self.memory_bank is None or not self.memory_bank.table_path:
            return False, []
        try:
            seq = self.memory_bank.find_similar_questions_table(
                question, top_n=self.table_top_n, threshold=self.seq_threshold)
            bm = self.memory_bank.find_similar_questions_bm25_table(
                question, top_n=self.table_top_n, threshold=self.bm25_threshold)
            return self._combine_matches(bm, seq, top_n)
        except Exception:
            logger.error("Error searching for similar questions", exc_info=True)
            return False, []

    def _consult_memory_bank(self, rewritten: str) -> List[Dict]:
        """db matches + table matches + vector QA store (deduped by
        rewritten question) — vllmChatService.py:372-393."""
        _, qa_pairs_db = self.get_similar_questions_db(rewritten)
        _, qa_pairs_table = self.get_similar_questions_table(rewritten)
        if self.qa_store is not None:
            seen_questions = {row["question"] for row in qa_pairs_table}
            for result in self.qa_store.query_qa(
                    rewritten, n_results=self.vector_top_n):
                q = result["question_rewritten"]
                if q in seen_questions:
                    continue
                qa_pairs_table.append({"question": q, "answer": result["data"]})
                seen_questions.add(q)
        return qa_pairs_db + qa_pairs_table

    # ------------------------------------------------------------------
    @staticmethod
    def _lang(question: str) -> str:
        return "中文" if _CJK_RE.search(question) else "English"

    def _retrieve_context(self, chat_manager: ChatManager, rewritten: str,
                          hypo_chunks: List[str],
                          all_retrieved_content: List) -> Tuple[str, Optional[str]]:
        if self.retrieval_batcher is not None:
            # single-readback fused path, wave-batched across sessions:
            # retrieval + rerank + selection ran on device in one program
            chunks, sel, _ = self.retrieval_batcher.retrieve(
                rewritten, hypo_chunks, chat_manager.query_time, timeout=120)
            all_retrieved_content.append(chunks)
            with profiler.span("rerank"):
                rag_context, timeinfo_list, selected = select_content(
                    chunks, sel)
                chat_manager.add_rag_info(rewritten, selected)
        else:
            retriever = self.retrievers[0]
            retriever_content = retriever.invoke(rewritten, hypo_chunks)
            all_retrieved_content.append(retriever_content)
            rag_context, timeinfo_list = get_rag_content(
                chat_manager, retriever_content, rewritten,
                chat_manager.query_time, retriever,
                min_bundle_chars=self.min_bundle_chars)
        rag_docu_time = (select_most_recent_time(timeinfo_list)
                         if timeinfo_list else None)
        return rag_context, rag_docu_time

    # ------------------------------------------------------------------
    def generate_response_with_rag(self, question: str, session_id: str,
                                   *args, **kwargs):
        with self._session_lock(session_id):
            return self._generate_response_with_rag(question, session_id,
                                                    *args, **kwargs)

    def _generate_response_with_rag(self, question: str, session_id: str,
                                   internal_input=None, interrupt_index=None):
        """Sync path: per-sub-question retrieve -> rerank -> answer loop over
        every configured retriever (vllmChatService.py:251-337)."""
        chat_manager = self.get_or_create_chat_manager(session_id)
        lang = self._lang(question)
        qa_history = chat_manager.get_qa_history()
        rewritten = chat_manager.if_query_rag(question, qa_history)

        chat_manager.reset_rag_info()
        answers: List[str] = []
        all_retrieved_content: List = []
        hypo_chunks_list: List[List[str]] = []

        for rewritten_question in rewritten:
            rag_context = ""
            used_time = None
            if chat_manager.need_rag:
                timeinfo_list: List[str] = []
                for retriever in self.retrievers:
                    hypo_chunks = (chat_manager.generate_hypo_chunks(
                        rewritten_question) if self.use_hyde else [])
                    hypo_chunks_list.append(hypo_chunks)
                    retriever_content = retriever.invoke(
                        rewritten_question, hypo_chunks)
                    all_retrieved_content.append(retriever_content)
                    current_context, timeinfo_list = get_rag_content(
                        chat_manager, retriever_content, rewritten_question,
                        chat_manager.query_time, retriever,
                        min_bundle_chars=self.min_bundle_chars)
                    rag_context += current_context + "\n"
                used_time = (select_most_recent_time(timeinfo_list)
                             if timeinfo_list else None)
            response = chat_manager.chat_internal(
                rewritten_question, rag_context, used_time, lang,
                internal_input=internal_input,
                interrupt_index=interrupt_index)
            answers.append(response.choices[0].message.content)

        if len(rewritten) > 1:
            answer = chat_manager.modify_answer(
                answers, question, rewritten, stream=False, lang=lang)
        else:
            answer = answers[0]

        chat_manager.add_to_qa_history(rewritten[-1], answer)
        chat_manager.all_retrieved_content = all_retrieved_content
        chat_manager.hypo_chunks = hypo_chunks_list
        return (answer, "", chat_manager.rag_info, rewritten,
                chat_manager.hypo_chunks, all_retrieved_content,
                chat_manager.get_qa_history())

    # ------------------------------------------------------------------
    def generate_response_async(self, question: str, session_id: str,
                                *args, **kwargs):
        """Concurrent requests for the SAME session serialize on a
        per-session lock (they share one ChatManager whose rag_info /
        qa_history are not safe under parallel mutation); different
        sessions still run fully in parallel."""
        with self._session_lock(session_id):
            return self._generate_response_async(question, session_id,
                                                 *args, **kwargs)

    def _generate_response_async(self, question: str, session_id: str,
                                internal_input: Optional[str] = None,
                                interrupt_index: Optional[int] = None):
        """Production path: sub-question chats gathered concurrently
        (vllmChatService.py:339-451).

        Parity note: ``internal_input``/``interrupt_index`` are accepted
        but unused here, exactly as in the reference (its async body never
        references either, vllmChatService.py:339-451); only the sync path
        wires them through chat_internal."""
        chat_manager = self.get_or_create_chat_manager(session_id)
        lang = self._lang(question)
        qa_history = chat_manager.get_qa_history()
        rewrittens = chat_manager.if_query_rag(question, qa_history)

        chat_manager.reset_rag_info()
        all_retrieved_content: List = []
        hypo_chunks_list: List[List[str]] = []

        loop = asyncio.new_event_loop()
        asyncio.set_event_loop(loop)
        try:
            chat_tasks = []
            hyde_resps = [[] for _ in rewrittens]
            for rewritten, hypo_chunks in zip(rewrittens, hyde_resps):
                qa_pairs_for_llm = self._consult_memory_bank(rewritten)
                if chat_manager.need_rag:
                    hypo_chunks_list.append(hypo_chunks)
                    rag_context, rag_docu_time = self._retrieve_context(
                        chat_manager, rewritten, hypo_chunks,
                        all_retrieved_content)
                else:
                    rag_context, rag_docu_time = "", ""
                chat_tasks.append(loop.create_task(chat_manager.chat_async(
                    rewritten, rag_context, rag_docu_time, lang,
                    qa_pairs_for_llm)))

            profiler.start("answer_sub")
            chat_resps = loop.run_until_complete(asyncio.gather(*chat_tasks))
            profiler.end("answer_sub")
        except Exception as e:
            logger.error("Error during task execution: %s", e)
            raise
        finally:
            loop.close()

        # chat_async returns (q, None) on timeout/error (reference
        # vllmManager.py:611-619); degrade to an apology instead of
        # dereferencing None (the reference crashes here — its own comment
        # says the None was meant "to prevent errors downstream")
        def _content(resp) -> str:
            if resp is None:
                return ("I'm sorry — the answer to this sub-question timed "
                        "out. Please try again.")
            return resp.choices[0].message.content

        if len(rewrittens) > 1:
            chat_answers = [_content(r) for _, r in chat_resps]
            chat_questions = [q for q, _ in chat_resps]
            final_answer = chat_manager.modify_answer(
                chat_answers, question, chat_questions, stream=False, lang=lang)
        else:
            final_answer = _content(chat_resps[0][1])

        chat_manager.add_to_qa_history(question, final_answer)
        chat_manager.all_retrieved_content = all_retrieved_content
        chat_manager.hypo_chunks = hypo_chunks_list
        return (final_answer, "", chat_manager.rag_info, rewrittens,
                chat_manager.hypo_chunks, all_retrieved_content,
                chat_manager.qa_history)

    # ------------------------------------------------------------------
    def generate_response_async_stream(self, question: str, session_id: str,
                                       *args, **kwargs):
        with self._session_lock(session_id):
            yield from self._generate_response_async_stream(
                question, session_id, *args, **kwargs)

    def _generate_response_async_stream(self, question: str, session_id: str,
                                       internal_input: Optional[str] = None,
                                       interrupt_index: Optional[int] = None):
        """SSE generator yielding "data: {json}\\n\\n" frames
        (vllmChatService.py:453-575, framing at :560)."""
        profiler.start("answer_stream")
        chat_manager = self.get_or_create_chat_manager(session_id)
        lang = self._lang(question)
        qa_history = chat_manager.get_qa_history()
        rewrittens = chat_manager.if_query_rag(question, qa_history)

        chat_manager.reset_rag_info()
        answer = None
        all_retrieved_content: List = []
        hypo_chunks_list: List[List[str]] = []

        loop = asyncio.new_event_loop()
        asyncio.set_event_loop(loop)
        try:
            chat_tasks = []
            hyde_resps = [[] for _ in rewrittens]
            for rewritten, hypo_chunks in zip(rewrittens, hyde_resps):
                qa_pairs_for_llm = self._consult_memory_bank(rewritten)
                hypo_chunks_list.append(hypo_chunks)
                rag_context, rag_docu_time = "", None
                if chat_manager.need_rag:
                    rag_context, rag_docu_time = self._retrieve_context(
                        chat_manager, rewritten, hypo_chunks,
                        all_retrieved_content)
                if len(rewrittens) == 1:
                    answer = chat_manager.chat_internal(
                        rewritten, rag_context, rag_docu_time, lang,
                        qa_pairs_for_llm, stream=True)
                else:
                    chat_tasks.append(loop.create_task(
                        chat_manager.chat_async(
                            rewritten, rag_context, rag_docu_time, lang,
                            qa_pairs_for_llm)))

            if len(rewrittens) > 1:
                profiler.start("answer_sub")
                chat_resps = loop.run_until_complete(asyncio.gather(*chat_tasks))
                profiler.end("answer_sub")
                # (q, None) on sub-answer timeout — degrade, don't crash
                chat_answers = [
                    (r.choices[0].message.content if r is not None else
                     "I'm sorry — the answer to this sub-question timed "
                     "out. Please try again.")
                    for _, r in chat_resps]
                chat_questions = [q for q, _ in chat_resps]
                answer = chat_manager.modify_answer(
                    chat_answers, question, chat_questions, stream=True,
                    lang=lang)
        except Exception as e:
            # by the time the generator runs, the server has already
            # prepared the event-stream response — an SSE error frame is
            # the only way the client learns of a setup failure (the
            # mid-stream handler below does the same, reference :561-563)
            logger.error("Error during task execution: %s", e)
            yield "data: " + json.dumps({"error": str(e)}) + "\n\n"
            answer = None
        finally:
            pending = [t for t in asyncio.all_tasks(loop) if not t.done()]
            for t in pending:
                t.cancel()
            loop.close()

        final_answer = ""
        try:
            first_flag = True
            for chunk in (answer or []):
                if first_flag:
                    first_flag = False
                    profiler.end("answer_stream")
                if chunk.delta is not None and chunk.delta.content:
                    final_answer += chunk.delta.content
                    yield ("data: "
                           + json.dumps({"response": chunk.delta.content})
                           + "\n\n")
        except Exception as e:
            logger.error("Error during stream response: %s", e)
            yield "data: " + json.dumps({"error": str(e)}) + "\n\n"

        chat_manager.add_to_qa_history(question, final_answer)
        chat_manager.all_retrieved_content = all_retrieved_content
        chat_manager.hypo_chunks = hypo_chunks_list

    # ------------------------------------------------------------------
    def generate_chat_summary(self, session_id: str) -> None:
        """Background summary with lock + event (vllmChatService.py:577-604)."""
        chat_manager = self.get_or_create_chat_manager(session_id)
        try:
            with chat_manager.summary_lock:
                chat_manager.is_summarizing = True
                chat_manager.summary_event.clear()
            qa_history = chat_manager.get_qa_history()
            new_summary = chat_manager.summarize_chat_history(qa_history)
            with chat_manager.summary_lock:
                chat_manager.history_summary = new_summary
                chat_manager.is_summarizing = False
                chat_manager.summary_event.set()
        except Exception as e:
            with chat_manager.summary_lock:
                chat_manager.is_summarizing = False
                chat_manager.summary_event.set()
            logger.error("An error occurred while generating summary: %s", e)

    def get_test_info(self, session_id: str):
        chat_manager = self.get_or_create_chat_manager(session_id)
        if chat_manager.is_summarizing:
            chat_manager.summary_event.wait(timeout=10)
        return None, chat_manager.need_rag
