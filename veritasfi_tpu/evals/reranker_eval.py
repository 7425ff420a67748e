"""Reranker IR-metric evaluation: NDCG / MRR / Precision / Recall.

Capability parity with reference experiments/reranker/metrics/evaluate.py:
relevance of a ranked chunk = embedding cosine >= threshold against any
ground-truth chunk (reference uses paraphrase-MiniLM cosine >= 0.95,
evaluate.py:14-43); metrics over the reranked ordering; checkpoint sweep
over saved training steps (evaluate.py:196-217).
"""

from __future__ import annotations

import math
import os
import re
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np


def calculate_ndcg(relevances: Sequence[float], k: Optional[int] = None) -> float:
    rel = list(relevances[:k] if k else relevances)
    dcg = sum(r / math.log2(i + 2) for i, r in enumerate(rel))
    ideal = sorted(relevances, reverse=True)[: len(rel)]
    idcg = sum(r / math.log2(i + 2) for i, r in enumerate(ideal))
    return dcg / idcg if idcg > 0 else 0.0


def compute_rr(relevances: Sequence[float]) -> float:
    for i, r in enumerate(relevances):
        if r > 0:
            return 1.0 / (i + 1)
    return 0.0


def calculate_precision(relevances: Sequence[float], k: int) -> float:
    rel = relevances[:k]
    return sum(1 for r in rel if r > 0) / k if k else 0.0


def calculate_recall(relevances: Sequence[float], num_relevant: int,
                     k: int) -> float:
    if num_relevant == 0:
        return 0.0
    return sum(1 for r in relevances[:k] if r > 0) / num_relevant


def relevance_by_similarity(ranked_texts: List[str], gt_texts: List[str],
                            embed_fn, threshold: float = 0.95) -> List[float]:
    """relevance[i] = 1 if cosine(ranked[i], any ground-truth) >= threshold
    (reference evaluate.py:14-43)."""
    if not ranked_texts or not gt_texts:
        return [0.0] * len(ranked_texts)
    # no in-place ops: real encoders (TextEncoder.encode) return read-only
    # views of device buffers
    a = np.asarray(embed_fn(ranked_texts), np.float32)
    b = np.asarray(embed_fn(gt_texts), np.float32)
    a = a / np.maximum(np.linalg.norm(a, axis=1, keepdims=True), 1e-12)
    b = b / np.maximum(np.linalg.norm(b, axis=1, keepdims=True), 1e-12)
    sims = a @ b.T
    return [1.0 if sims[i].max() >= threshold else 0.0
            for i in range(len(ranked_texts))]


def evaluate_reranker(
    samples: Sequence[Dict],      # {query, candidates: [str], ground_truth: [str]}
    scorer: Callable[[List[List[str]]], Sequence[float]],
    embed_fn,
    k: int = 10,
    threshold: float = 0.95,
) -> Dict[str, float]:
    """Rerank candidates with ``scorer`` and compute IR metrics@k."""
    ndcgs, rrs, precisions, recalls = [], [], [], []
    for sample in samples:
        candidates = sample["candidates"]
        scores = np.asarray(
            scorer([[sample["query"], c] for c in candidates]), np.float32)
        order = np.argsort(-scores, kind="stable")
        ranked = [candidates[i] for i in order]
        rel = relevance_by_similarity(ranked, sample["ground_truth"],
                                      embed_fn, threshold)
        # ranked is a permutation of candidates, so the relevant COUNT is
        # order-independent — re-judging the unranked list would double the
        # dominant embedding cost of a checkpoint sweep
        num_relevant = int(sum(rel))
        ndcgs.append(calculate_ndcg(rel, k))
        rrs.append(compute_rr(rel))
        precisions.append(calculate_precision(rel, k))
        recalls.append(calculate_recall(rel, num_relevant, k))
    n = max(len(samples), 1)
    return {
        f"ndcg@{k}": sum(ndcgs) / n,
        "mrr": sum(rrs) / n,
        f"precision@{k}": sum(precisions) / n,
        f"recall@{k}": sum(recalls) / n,
    }


def sweep_checkpoints(checkpoint_dir: str, make_scorer, samples, embed_fn,
                      k: int = 10) -> List[Dict]:
    """Evaluate every saved training step under ``checkpoint_dir``
    (reference sweeps checkpoint-100..1650, evaluate.py:196-217)."""
    results = []
    steps = []
    for name in sorted(os.listdir(checkpoint_dir)):
        m = re.fullmatch(r"step_(\d+)", name)
        if m:
            steps.append((int(m.group(1)), os.path.join(checkpoint_dir, name)))
    for step, path in sorted(steps):
        scorer = make_scorer(path)
        metrics = evaluate_reranker(samples, scorer, embed_fn, k=k)
        results.append({"step": step, **metrics})
    return results
