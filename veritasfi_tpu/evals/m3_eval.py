"""Does candidate-stage M3 fusion beat dense-only ranking? Measured on
the graded quality fixture.

The M3 heads (models/m3_heads.py) are a beyond-reference capability — the
reference's own BGE-M3 embedder computes them and throws two away
(faissRetriever.py:33 stores only the dense vector). Adding capability is
not enough; this eval measures whether the fusion actually ranks better
on the in-repo graded fixture (evals/quality_parity.py::build_records:
5 graded chunks per query — primary/near-dup grade 3, paraphrase 2,
related 1, off-date 0 — plus hard lexical fillers).

Protocol (candidate-stage, mirroring how the scorer deploys):
  1. train ONE M3 encoder on the fixture's (question, positive) pairs
     with the joint multi-head loss (train/m3.py) — every head gets the
     same training signal, so the comparison is between SCORING RULES,
     not between better- and worse-trained models;
  2. for each query, take the dense head's top-CANDIDATES rows (the
     retrieval stage both arms share);
  3. rank those candidates by (a) dense cosine alone, (b) the fused
     dense+sparse+colbert score, and (c/d) each auxiliary head alone
     (ablation columns);
  4. NDCG@10 / precision@10 / recall@10 / MRR with graded relevance,
     averaged over queries.

The headline value is fused NDCG@10; ``vs_baseline`` is the ratio to the
dense-only NDCG@10 of the SAME encoder over the SAME candidates (>1
means the thrown-away heads carry real ranking signal).

Run: python -m veritasfi_tpu.evals.m3_eval --out M3_r04.json
"""

from __future__ import annotations

import argparse
import json
import time
from typing import Dict, List, Optional

import numpy as np


def run_m3_eval(seed: int = 0, steps: int = 160, n_queries: int = 40,
                n_filler: int = 160, candidates: int = 20,
                k: int = 10) -> Dict:
    from ..models.m3_heads import M3Encoder
    from ..retrieval.m3_scorer import M3CandidateScorer
    from ..train.m3 import M3ContrastiveTrainer
    from .quality_parity import build_records
    from .reranker_eval import (calculate_ndcg, calculate_precision,
                                calculate_recall, compute_rr)

    t0 = time.perf_counter()
    records, facts, grades = build_records(seed, n_queries=n_queries,
                                           n_filler=n_filler)
    texts = [r.content for r in records]

    # one encoder, jointly trained; positives sampled across the graded
    # surface forms exactly like the fixture reranker's training data
    rng = np.random.default_rng(seed)
    pairs = []
    for qi, (question, fact, primary) in enumerate(facts):
        g_texts = list(grades[qi])         # primary, near-dup, paraphrase…
        pairs.append((question, g_texts[int(rng.integers(3))]))
        pairs.append((fact, primary))
    enc = M3Encoder(preset="tiny-test", max_length=64, seed=seed)
    trainer = M3ContrastiveTrainer(enc, total_steps=steps)
    losses = trainer.fit(pairs, steps=steps, batch_size=40, seed=seed)

    scorer = M3CandidateScorer(enc, texts, doc_max_length=64)

    arms = {"dense": (1.0, 0.0, 0.0), "sparse": (0.0, 1.0, 0.0),
            "colbert": (0.0, 0.0, 1.0), "fused": None}   # None = default
    metrics = {a: {"ndcg": [], "mrr": [], "precision": [], "recall": []}
               for a in arms}
    d_dense = np.asarray(scorer.d_dense, np.float32)
    for qi, (question, fact, primary) in enumerate(facts):
        # shared retrieval stage: dense top-`candidates`
        q_dense = enc.encode([question])[0]
        sims = d_dense @ q_dense
        rows = np.argsort(-sims, kind="stable")[:candidates]
        comp = scorer.score_rows(question, rows, components=True)
        n_rel = sum(1 for g in grades[qi].values() if g > 0)
        for arm, w in arms.items():
            if w is None:
                s = comp["fused"]
            else:
                s = (w[0] * comp["dense"] + w[1] * comp["sparse"]
                     + w[2] * comp["colbert"])
            order = np.argsort(-s, kind="stable")
            rel = [grades[qi].get(texts[rows[i]], 0.0) for i in order]
            m = metrics[arm]
            m["ndcg"].append(calculate_ndcg(rel, k))
            m["mrr"].append(compute_rr(rel))
            m["precision"].append(calculate_precision(rel, k))
            m["recall"].append(calculate_recall(rel, n_rel, k))

    summary = {a: {name: round(float(np.mean(xs)), 4)
                   for name, xs in m.items()}
               for a, m in metrics.items()}
    fused, dense = summary["fused"]["ndcg"], summary["dense"]["ndcg"]
    return {
        "metric": "m3_fused_ndcg_at_10",
        "value": fused,
        "unit": "ndcg",
        "vs_baseline": round(fused / dense, 4) if dense else None,
        "detail": {
            "baseline": "dense-only ranking of the SAME trained encoder "
                        "over the SAME dense-retrieved candidates (the "
                        "reference's scoring rule)",
            "fixture": f"{n_queries} queries x 5 graded chunks "
                       f"+ {n_filler} hard fillers "
                       "(quality_parity.build_records)",
            "candidates_per_query": candidates,
            "train_steps": steps,
            "final_loss": round(float(losses[-1]), 4),
            "per_arm": summary,
            "scorer_hbm_mb": round(scorer.hbm_bytes / 1e6, 1),
            "elapsed_s": round(time.perf_counter() - t0, 1),
            "weights_fused": [float(x) for x in np.asarray(scorer.weights)],
        },
    }


def main(argv: Optional[List[str]] = None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--seeds", type=int, default=1,
                        help="run N independent seeds (fixture + training "
                             "+ fusion weights all re-drawn) and report "
                             "per-seed NDCG plus the mean — a single-seed "
                             "delta on a synthetic fixture is noise-prone")
    parser.add_argument("--steps", type=int, default=160)
    parser.add_argument("--queries", type=int, default=40)
    parser.add_argument("--filler", type=int, default=160)
    parser.add_argument("--candidates", type=int, default=20)
    parser.add_argument("--out", default=None)
    args = parser.parse_args(argv)
    runs = [run_m3_eval(seed=args.seed + i, steps=args.steps,
                        n_queries=args.queries, n_filler=args.filler,
                        candidates=args.candidates)
            for i in range(max(1, args.seeds))]
    result = runs[0]
    if len(runs) > 1:
        per_seed = [{"seed": args.seed + i,
                     "fused_ndcg": r["value"],
                     "dense_ndcg": r["detail"]["per_arm"]["dense"]["ndcg"],
                     "vs_baseline": r["vs_baseline"]}
                    for i, r in enumerate(runs)]
        result["value"] = round(float(np.mean([r["value"] for r in runs])), 4)
        dense_mean = float(np.mean(
            [r["detail"]["per_arm"]["dense"]["ndcg"] for r in runs]))
        result["vs_baseline"] = (round(result["value"] / dense_mean, 4)
                                 if dense_mean else None)
        result["detail"]["per_seed"] = per_seed
        result["detail"]["seeds"] = len(runs)
        result["detail"]["note"] = (
            "value/vs_baseline are MEANS over independent seeds; "
            "per_arm shows seed 0 only")
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
