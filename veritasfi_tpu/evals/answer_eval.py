"""End-to-end answer quality evaluation (RAGAS-style, LLM-judged).

Capability parity with reference experiments/reranker/RAGAS/: factual
correctness (eval_correctness.py:28,124-151) plus faithfulness, response
relevancy, context recall and context precision (eval_rest.py:28-31) judged
by an external LLM. The ragas library is replaced by first-party judge
prompts over the same OpenAI-protocol client, each returning a parsed
"Score: x" in [0, 1]; artifacts match the e2e harness's per-question JSON
(qa_e2e_async.py:136-143 -> eval_rest.py:176-207 matching on
original_question / rag_info chunk_content).
"""

from __future__ import annotations

import json
import logging
import re
from typing import Dict, List, Optional, Sequence

logger = logging.getLogger(__name__)

_SCORE_RE = re.compile(r"Score:\s*([0-9.]+)")

_METRIC_PROMPTS = {
    "factual_correctness": (
        "Compare the claims in the Answer against the Reference answer. "
        "Score the factual overlap from 0 to 1 (1 = every claim in the "
        "answer is supported by the reference and nothing important is "
        "missing)."),
    "faithfulness": (
        "Check whether every claim in the Answer can be inferred from the "
        "Context. Score from 0 to 1 (1 = fully grounded, 0 = fabricated)."),
    "response_relevancy": (
        "Judge how directly the Answer addresses the Question. Score from "
        "0 to 1 (1 = fully on-topic and complete, 0 = unrelated)."),
    "context_recall": (
        "Check how much of the Reference answer's information appears in "
        "the Context. Score from 0 to 1 (1 = the context contains "
        "everything needed)."),
    "context_precision": (
        "Judge what fraction of the Context is actually useful for "
        "answering the Question. Score from 0 to 1 (1 = every chunk is "
        "relevant)."),
}


class AnswerJudge:
    """LLM judge over the OpenAI-protocol client."""

    def __init__(self, llm, model_name: str, max_retry: int = 3) -> None:
        self.llm = llm
        self.model_name = model_name
        self.max_retry = max_retry

    def score(self, metric: str, question: str, answer: str,
              context: str = "", reference: str = "") -> Optional[float]:
        instructions = _METRIC_PROMPTS[metric]
        system = (f"You are a strict evaluator. {instructions}\n"
                  "Respond in exactly this format:\nScore: [number]\n"
                  "Reason: [one sentence]")
        user = f"Question: {question}\nAnswer: {answer}"
        if context:
            user += f"\nContext: {context}"
        if reference:
            user += f"\nReference: {reference}"
        for _ in range(self.max_retry):
            try:
                completion = self.llm.chat(
                    model=self.model_name,
                    messages=[{"role": "system", "content": system},
                              {"role": "user", "content": user}],
                    temperature=0, top_p=0.8)
                text = completion.choices[0].message.content
                match = _SCORE_RE.search(text)
                if match:
                    return max(0.0, min(1.0, float(match.group(1))))
            except Exception as e:
                logger.warning("judge error on %s: %s", metric, e)
        return None


def evaluate_answers(
    artifacts: Sequence[Dict],   # e2e harness outputs
    judge: AnswerJudge,
    metrics: Sequence[str] = ("factual_correctness", "faithfulness",
                              "response_relevancy", "context_recall",
                              "context_precision"),
    out_path: Optional[str] = None,
) -> Dict[str, float]:
    """artifacts rows: {original_question, answer, reference?, rag_info}."""
    per_metric: Dict[str, List[float]] = {m: [] for m in metrics}
    rows = []
    for art in artifacts:
        context = "\n".join(
            info.get("chunk_content", "") for info in art.get("rag_info", []))
        row = {"question": art["original_question"]}
        for metric in metrics:
            needs_ref = metric in ("factual_correctness", "context_recall")
            if needs_ref and not art.get("reference"):
                continue
            # context-dependent metrics are meaningless without retrieved
            # context (e.g. a need_rag=False answer) — skip like the
            # missing-reference case instead of averaging judge noise
            needs_ctx = metric in ("faithfulness", "context_recall",
                                   "context_precision")
            if needs_ctx and not context.strip():
                continue
            s = judge.score(metric, art["original_question"],
                            art.get("answer", ""), context=context,
                            reference=art.get("reference", ""))
            if s is not None:
                per_metric[metric].append(s)
                row[metric] = s
        rows.append(row)
    summary = {m: (sum(v) / len(v) if v else None)
               for m, v in per_metric.items()}
    if out_path:
        with open(out_path, "w", encoding="utf-8") as f:
            json.dump({"summary": summary, "per_question": rows}, f,
                      ensure_ascii=False, indent=2)
    return summary
