"""End-to-end QA harness.

Capability parity with reference experiments/e2e/qa_e2e_async.py:54-168:
builds the full stack, iterates question batches (one session per batch),
calls the async answer path, and dumps per-question JSON artifacts
(answer / duration / rewritten / need_rag / rag_info /
all_retrieved_content) consumed by the answer-quality evals; optional LLM
self-judge accuracy against expected answers (qa_e2e_async.py:146-155 via
ChatManager.evaluate).
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, List, Sequence

logger = logging.getLogger(__name__)


def load_questions(path: str) -> List[Dict]:
    """Question files: .json ([{question, answer?}] or [str]), or .md/.txt
    (one question per non-empty line)."""
    if path.endswith(".json"):
        with open(path, encoding="utf-8") as f:
            rows = json.load(f)
        out = []
        for row in rows:
            if isinstance(row, str):
                out.append({"question": row})
            else:
                out.append({"question": row["question"],
                            "answer": row.get("answer", "")})
        return out
    with open(path, encoding="utf-8") as f:
        return [{"question": line.strip()} for line in f
                if line.strip() and not line.strip().startswith("#")]


def run_e2e(
    chat_service,
    question_batches: Sequence[Sequence[Dict]],
    out_dir: str,
    self_judge: bool = False,
) -> List[Dict]:
    """One session per batch; artifact JSON per question
    (question_<batch>_<j>.json like the reference)."""
    os.makedirs(out_dir, exist_ok=True)
    artifacts: List[Dict] = []
    for bi, batch in enumerate(question_batches):
        session_id = f"e2e_batch_{bi}"
        for qi, item in enumerate(batch):
            question = item["question"]
            t0 = time.perf_counter()
            (answer, _, rag_info, rewrittens, hypo, retrieved,
             qa_history) = chat_service.generate_response_async(
                question, session_id)
            duration = time.perf_counter() - t0
            manager = chat_service.get_or_create_chat_manager(session_id)
            artifact = {
                "original_question": question,
                "answer": answer,
                "reference": item.get("answer", ""),
                "duration_s": duration,
                "rewritten": rewrittens,
                "need_rag": manager.need_rag,
                "rag_info": rag_info,
                "all_retrieved_content": [
                    [{"retriever": c["retriever"], "score": c["score"],
                      "content": c["page_content"]} for c in chunks]
                    for chunks in retrieved
                ],
            }
            if self_judge and item.get("answer"):
                try:
                    score, reason = manager.evaluate(answer, item["answer"])
                    artifact["self_judge"] = {"score": score,
                                              "reason": reason}
                except Exception as e:
                    logger.warning("self-judge failed: %s", e)
            path = os.path.join(out_dir, f"question_{bi}_{qi}.json")
            with open(path, "w", encoding="utf-8") as f:
                json.dump(artifact, f, ensure_ascii=False, indent=2)
            artifacts.append(artifact)
    return artifacts
