"""Training-data mining for the reranker (LLM auto-annotation).

Capability parity with the reference's training-data flow (SURVEY.md §3.4):
retrieval candidates per query are labeled relevant/irrelevant by an LLM
using the annotation rubric (reference src/prompts/auto_annotate.py:1-48 —
relevance = direct answer / contextual support / fuzzy-time match), then
packed into train groups of 1 positive + (group_size - 1) negatives
(train_bge_rr.sh:18). Stage-1 general-domain data is produced by
anonymizing the company identity (README.md:24-27).
"""

from __future__ import annotations

import json
import logging
import random
import re
from typing import Dict, List, Optional, Sequence, Tuple

from ..serving.prompts import get_annotation_prompt
from ..train.reranker_lora import anonymize_company

logger = logging.getLogger(__name__)

_REL_RE = re.compile(r"Relevance:\s*(YES|NO)", re.IGNORECASE)


def annotate_chunk(llm, model_name: str, question: str, chunk: str,
                   max_retry: int = 3) -> Optional[bool]:
    """YES/NO relevance label via the annotation rubric."""
    for _ in range(max_retry):
        try:
            completion = llm.chat(
                model=model_name,
                messages=[
                    {"role": "system",
                     "content": get_annotation_prompt(question, chunk)},
                    {"role": "user", "content": "Label the chunk."},
                ],
                temperature=0, top_p=0.8)
            match = _REL_RE.search(completion.choices[0].message.content)
            if match:
                return match.group(1).upper() == "YES"
        except Exception as e:
            logger.warning("annotation error: %s", e)
    return None


def mine_training_groups(
    samples: Sequence[Dict],       # {question, candidates: [str]}
    llm,
    model_name: str,
    group_size: int = 8,           # 1 pos + 7 negs (train_bge_rr.sh:18)
    seed: int = 0,
    anonymize: bool = False,
    company: str = "Zeekr",
) -> List[Tuple[str, List[str]]]:
    """Label candidates per question and emit (query, [pos] + negs) groups.

    Negatives are the labeled-irrelevant candidates of the same question
    (hard negatives — they were retrieved), padded by sampling when short.
    """
    rng = random.Random(seed)
    groups: List[Tuple[str, List[str]]] = []
    for sample in samples:
        question = sample["question"]
        positives, negatives = [], []
        for chunk in sample["candidates"]:
            label = annotate_chunk(llm, model_name, question, chunk)
            if label is True:
                positives.append(chunk)
            elif label is False:
                negatives.append(chunk)
        if not positives or not negatives:
            continue
        need = group_size - 1
        for pos in positives:
            if len(negatives) >= need:
                negs = rng.sample(negatives, need)
            else:
                negs = list(negatives)
                while len(negs) < need:
                    negs.append(rng.choice(negatives))
            query, passages = question, [pos] + negs
            if anonymize:
                query = anonymize_company(query, company)
                passages = [anonymize_company(p, company) for p in passages]
            groups.append((query, passages))
    return groups


def save_groups(groups: Sequence[Tuple[str, List[str]]], path: str) -> None:
    """FlagEmbedding-contract JSONL: {query, pos: [str], neg: [str, ...]}
    (reference data format consumed by train_bge_rr.sh) — exactly what
    `cli train-reranker --data` parses, so mined data feeds the trainer
    directly."""
    with open(path, "w", encoding="utf-8") as f:
        for query, passages in groups:
            f.write(json.dumps({"query": query, "pos": [passages[0]],
                                "neg": passages[1:]}, ensure_ascii=False)
                    + "\n")


def load_groups(path: str) -> List[Tuple[str, List[str]]]:
    out = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            row = json.loads(line)
            out.append((row["query"],
                        [row["pos"][0]] + list(row["neg"])))
    return out
