"""Retrieval-quality evaluation pipeline (offline, 4 stages).

Capability parity with the reference pipeline (SURVEY.md §3.5):
  1. query rewrite over a dataset (reference:
     experiments/retriever/query_rewrite.py:59-206 — adds
     rewritten/query_time/need_rag columns);
  2. HyDE generation with perplexity = exp(-mean(logprob))
     (experiments/retriever/step1.py:86-88) and incremental checkpointing
     (step1.py:126);
  3. recall collection — EnsembleRetriever dump of chunks/retriever
     tags/scores per rewritten question (step2_mod.py:52-106);
  4. hit-rate judging — rank chunks against each evidence by embedding
     cosine, judge a hit by similarity >= 0.9 / string containment / LLM
     majority vote (step3_mul.py:111-131,291-353), then aggregate
     avg_hit_rate / avg_chunk statistics (step3_mul.py:355-378).

TPU-native difference: the reference fans out a multiprocessing pool with
per-worker GPUs (step3_mul.py:406-431); here evidence/chunk embeddings are
batched through the jitted encoder on one (or a mesh of) chip(s).
"""

from __future__ import annotations

import json
import logging
import os
from dataclasses import asdict, dataclass, field
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)


@dataclass
class RewriteRecord:
    question: str
    rewrittens: List[str] = field(default_factory=list)
    query_time: str = ""
    need_rag: bool = False
    hyde: List[str] = field(default_factory=list)
    # per-rewritten HyDE mapping: retrieval for sub-question A must not
    # fuse sub-question B's hypothetical documents (the flat ``hyde`` list
    # is kept for serialized-record compatibility)
    hyde_by_rewritten: Dict[str, List[str]] = field(default_factory=dict)
    perplexity: List[float] = field(default_factory=list)
    evidences: List[str] = field(default_factory=list)
    chunks: List[Dict] = field(default_factory=list)


# ---------------------------------------------------------------------------
# Stage 1: query rewrite
# ---------------------------------------------------------------------------
def rewrite_dataset(samples: Sequence[Dict], chat_manager=None,
                    checkpoint_path: Optional[str] = None,
                    num_workers: int = 1,
                    chat_manager_factory: Optional[Callable] = None
                    ) -> List[RewriteRecord]:
    """Adds rewrittens/query_time/need_rag via the 3-line protocol.

    The stage is LLM-RPC-bound; the reference fans it out with
    ``datasets.map(num_proc=16)`` (query_rewrite.py:141-206). Here
    ``num_workers > 1`` + ``chat_manager_factory`` fan the RPCs out over a
    thread pool with one ChatManager per worker thread (ChatManager keeps
    per-call state, so managers must not be shared across threads).
    Results keep dataset order; checkpointing stays incremental."""
    if num_workers > 1:
        if chat_manager_factory is None:
            raise ValueError("num_workers > 1 requires chat_manager_factory "
                             "(one ChatManager per worker thread)")
        import threading
        from concurrent.futures import ThreadPoolExecutor

        local = threading.local()

        def work(sample: Dict) -> RewriteRecord:
            mgr = getattr(local, "mgr", None)
            if mgr is None:
                mgr = local.mgr = chat_manager_factory()
            rec = RewriteRecord(question=sample["question"],
                                evidences=list(sample.get("evidences", [])))
            rec.rewrittens = mgr.if_query_rag(rec.question, "")
            rec.query_time = mgr.query_time.strftime("%Y-%m-%d")
            rec.need_rag = mgr.need_rag
            return rec

        out: List[RewriteRecord] = []
        with ThreadPoolExecutor(num_workers) as ex:
            for rec in ex.map(work, samples):   # in order; workers run ahead
                out.append(rec)
                if checkpoint_path:
                    _save_records(out, checkpoint_path)
        return out

    if chat_manager is None:
        raise ValueError("chat_manager required for the serial path")
    out = []
    for sample in samples:
        rec = RewriteRecord(question=sample["question"],
                            evidences=list(sample.get("evidences", [])))
        rec.rewrittens = chat_manager.if_query_rag(rec.question, "")
        rec.query_time = chat_manager.query_time.strftime("%Y-%m-%d")
        rec.need_rag = chat_manager.need_rag
        out.append(rec)
        if checkpoint_path:
            _save_records(out, checkpoint_path)
    return out


# ---------------------------------------------------------------------------
# Stage 2: HyDE + perplexity
# ---------------------------------------------------------------------------
def calculate_perplexity(logprobs: Sequence[float]) -> float:
    """exp(-mean(logprob)) (reference step1.py:86-88)."""
    if not logprobs:
        return float("inf")
    return float(np.exp(-np.mean(logprobs)))


def hyde_with_perplexity(records: List[RewriteRecord], chat_manager,
                         logprob_fn: Optional[Callable[[str], List[float]]] = None,
                         checkpoint_path: Optional[str] = None
                         ) -> List[RewriteRecord]:
    """Generates HyDE texts per rewritten question; perplexity from
    ``logprob_fn`` when the serving endpoint returns logprobs."""
    for rec in records:
        for rewritten in rec.rewrittens:
            chunks = chat_manager.generate_hypo_chunks(rewritten)
            rec.hyde.extend(chunks)
            rec.hyde_by_rewritten[rewritten] = list(chunks)
            if logprob_fn is not None:
                for c in chunks:
                    rec.perplexity.append(calculate_perplexity(logprob_fn(c)))
        if checkpoint_path:
            _save_records(records, checkpoint_path)
    return records


# ---------------------------------------------------------------------------
# Stage 3: recall collection
# ---------------------------------------------------------------------------
def collect_recall(records: List[RewriteRecord], retriever,
                   use_hyde: bool = True) -> List[RewriteRecord]:
    """Runs the ensemble per rewritten question, recording chunk
    text/retriever tag/score (reference defaults faiss_k=40, bm25_k=10,
    faiss_ts_k=10 — step2_mod.py:120-122 — configured on the retriever)."""
    for rec in records:
        for rewritten in rec.rewrittens:
            hyde = (rec.hyde_by_rewritten.get(rewritten, rec.hyde)
                    if use_hyde else [])
            for chunk in retriever.invoke(rewritten, hyde):
                rec.chunks.append({
                    "content": chunk["page_content"],
                    "retriever": chunk["retriever"],
                    "score": chunk["score"],
                    "doc_id": chunk["metadata"]["doc_id"],
                })
    return records


# ---------------------------------------------------------------------------
# Stage 4: hit-rate judging
# ---------------------------------------------------------------------------
def build_judge_embed_fn(name: str) -> Callable[[List[str]], np.ndarray]:
    """Build the judge's embedding function from a model name.

    The reference judges with a DEDICATED embedder — Qwen3-Embedding-4B
    last-token pooling (step3_mul.py:181-209,384) — not the retrieval
    encoder. Accepts: a local HF checkpoint dir (decoder families qwen2/
    qwen3/gemma via DecoderEmbedder; BERT/XLM-R via TextEncoder), or a
    decoder preset name (random weights: plumbing/CI mode)."""
    import os

    if os.path.isdir(name):
        import json as _json

        with open(os.path.join(name, "config.json")) as f:
            model_type = _json.load(f).get("model_type", "")
        if model_type in ("qwen2", "qwen3", "gemma"):
            from ..models.decoder_embedder import \
                load_decoder_embedder_from_dir

            return load_decoder_embedder_from_dir(name).encode
        from ..models.hf_loader import load_encoder_from_dir

        return load_encoder_from_dir(name).encode
    from ..models.decoder_embedder import DecoderEmbedder
    from ..models.reranker import DECODER_PRESETS

    if name in DECODER_PRESETS:
        logger.warning("judge embedder '%s': random weights (no "
                       "checkpoint)", name)
        return DecoderEmbedder(preset=name).encode
    raise ValueError(f"unknown judge model {name!r}: not a checkpoint "
                     f"dir or decoder preset")


def judge_hits(
    evidences: List[str],
    chunk_texts: List[str],
    embed_fn,
    method: str = "cos",
    sim_threshold: float = 0.9,        # step3_mul.py:390
    top_chunks: int = 5,
    llm_vote: Optional[Callable[[str, str], bool]] = None,
    vote_rounds: int = 3,
) -> List[bool]:
    """Per evidence: rank chunks by embedding cosine, judge hit on the top
    ones by the configured method (cos / string / llm majority vote)."""
    if method == "llm" and llm_vote is None:
        raise ValueError(
            "judge method 'llm' needs an llm_vote callable (e.g. "
            "ChatManager.evaluate_chunk) — failing now, before the "
            "expensive judging loop")
    if not evidences or not chunk_texts:
        return [False] * len(evidences)
    # no in-place ops: real encoders (TextEncoder.encode) return read-only
    # views of device buffers
    emb_e = np.asarray(embed_fn(evidences), np.float32)
    emb_c = np.asarray(embed_fn(chunk_texts), np.float32)
    emb_e = emb_e / np.maximum(np.linalg.norm(emb_e, axis=1, keepdims=True),
                               1e-12)
    emb_c = emb_c / np.maximum(np.linalg.norm(emb_c, axis=1, keepdims=True),
                               1e-12)
    sims = emb_e @ emb_c.T
    hits = []
    for i, evidence in enumerate(evidences):
        order = np.argsort(-sims[i])[:top_chunks]
        hit = False
        for j in order:
            if method == "cos":
                hit = sims[i, j] >= sim_threshold
            elif method == "string":
                hit = (evidence.strip() and
                       evidence.strip() in chunk_texts[j])
            elif method == "llm":
                votes = sum(
                    1 for _ in range(vote_rounds)
                    if llm_vote(evidence, chunk_texts[j]))
                hit = votes * 2 > vote_rounds
            else:
                raise ValueError(f"unknown judge method {method}")
            if hit:
                break
        hits.append(bool(hit))
    return hits


def hit_rate_eval(records: List[RewriteRecord], embed_fn,
                  method: str = "cos", sim_threshold: float = 0.9,
                  llm_vote=None) -> List[Dict]:
    results = []
    for rec in records:
        texts = [c["content"] for c in rec.chunks]
        hits = judge_hits(rec.evidences, texts, embed_fn, method=method,
                          sim_threshold=sim_threshold, llm_vote=llm_vote)
        results.append({
            "question": rec.question,
            "hit_rate": (sum(hits) / len(hits)) if hits else 0.0,
            "num_chunks": len(rec.chunks),
            "num_evidences": len(rec.evidences),
        })
    return results


def aggregate_hit_stats(results: List[Dict],
                        out_path: Optional[str] = None) -> Dict:
    """Corpus statistic.json (reference step3_mul.py:364-378) + CSV rows
    for cross-experiment collection (collect_all_datasets.py)."""
    stats = {
        "avg_hit_rate": (float(np.mean([r["hit_rate"] for r in results]))
                         if results else 0.0),
        "avg_chunk": (float(np.mean([r["num_chunks"] for r in results]))
                      if results else 0.0),
        "num_samples": len(results),
    }
    if out_path:
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        with open(out_path, "w") as f:
            json.dump({"per_sample": results, **stats}, f, indent=2)
    return stats


def _save_records(records: List[RewriteRecord], path: str) -> None:
    with open(path, "w", encoding="utf-8") as f:
        json.dump([asdict(r) for r in records], f, ensure_ascii=False)


def collect_experiments(root: str, out_csv: Optional[str] = None) -> List[Dict]:
    """Walk ``root/<version>/<experiment>/statistic.json`` and tabulate
    avg_hit_rate / avg_chunk across versions x experiments (reference:
    experiments/retriever/collect_all_datasets.py:15-103 — CSV + grouped
    bars; the tabular output here feeds any plotting frontend)."""
    rows: List[Dict] = []
    for version in sorted(os.listdir(root)):
        vdir = os.path.join(root, version)
        if not os.path.isdir(vdir):
            continue
        for experiment in sorted(os.listdir(vdir)):
            stat = os.path.join(vdir, experiment, "statistic.json")
            if not os.path.exists(stat):
                continue
            with open(stat) as f:
                data = json.load(f)
            rows.append({
                "version": version,
                "experiment": experiment,
                "avg_hit_rate": data.get("avg_hit_rate"),
                "avg_chunk": data.get("avg_chunk"),
                "num_samples": data.get("num_samples"),
            })
    if out_csv and rows:
        import csv

        with open(out_csv, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            writer.writeheader()
            writer.writerows(rows)
    return rows


def _load_result_records(path: str) -> List[Dict]:
    """Records from a result file: a JSON list, a JSON dict with a
    ``per_sample`` list (our statistic.json shape), or JSONL — no external
    dataset library needed (reference loads via HF datasets,
    collect_num_recalls.py:37-54)."""
    with open(path, encoding="utf-8") as f:
        text = f.read().strip()
    if not text:
        return []
    try:
        data = json.loads(text)
        if isinstance(data, dict):
            data = data.get("per_sample", [data])
        return [r for r in data if isinstance(r, dict)]
    except json.JSONDecodeError:
        records = []
        for line in text.splitlines():
            line = line.strip()
            if line:
                records.append(json.loads(line))
        return [r for r in records if isinstance(r, dict)]


def _record_num_recalls(record: Dict) -> Optional[float]:
    """num_recalls for one record: the explicit field when present
    (reference record shape), else derived from our native ``chunks`` /
    ``num_chunks`` fields."""
    v = record.get("num_recalls")
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        return float(v)
    if isinstance(record.get("chunks"), list):
        return float(len(record["chunks"]))
    v = record.get("num_chunks")
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        return float(v)
    return None


def _record_unique_recall(record: Dict) -> Optional[int]:
    """Count of UNIQUE recalled chunk texts (string equality — reference
    collect_num_recalls.py:67-80 sets over ``query_chunks``); derived from
    ``chunks[*].content`` for our record shape."""
    chunks = record.get("query_chunks")
    if chunks is None and isinstance(record.get("chunks"), list):
        chunks = [c.get("content") if isinstance(c, dict) else c
                  for c in record["chunks"]]
    if isinstance(chunks, list):
        return len({str(c) for c in chunks})
    return None


def collect_num_recalls(root: str, filename: str = "result.json"
                        ) -> List[Dict]:
    """Per-file num_recalls + unique-recall statistics over every matching
    result file under ``root`` (recursive), reference
    collect_num_recalls.py:57-129: per file — record count, avg/min/max
    num_recalls, avg/min/max unique-recall (files that fail to parse are
    skipped with a warning, as there)."""
    stats_list: List[Dict] = []
    paths = sorted(
        os.path.join(dirpath, fn)
        for dirpath, _dirs, files in os.walk(root)
        for fn in files if fn == filename)
    for path in paths:
        try:
            records = _load_result_records(path)
        except Exception as e:
            logger.warning("skipping unparseable result file %s: %s",
                           path, e)
            continue
        values = [v for v in (_record_num_recalls(r) for r in records)
                  if v is not None]
        uniques = [v for v in (_record_unique_recall(r) for r in records)
                   if v is not None]
        stats_list.append({
            "path": os.path.relpath(path, root),
            "count": len(values),
            "values": values,
            "average": sum(values) / len(values) if values else None,
            "minimum": min(values) if values else None,
            "maximum": max(values) if values else None,
            "unique_recall_values": uniques,
            "unique_recall_average": (sum(uniques) / len(uniques)
                                      if uniques else None),
            "unique_recall_minimum": min(uniques) if uniques else None,
            "unique_recall_maximum": max(uniques) if uniques else None,
        })
    return stats_list


def summarize_num_recalls(stats_list: List[Dict],
                          out_path: Optional[str] = None) -> Dict:
    """Overall roll-up across files (reference print_summary's OVERALL
    STATISTICS block, collect_num_recalls.py:184-207) as a machine-readable
    dict; optionally written next to the per-file stats as JSON."""
    all_values = [v for s in stats_list for v in s["values"]]
    all_uniques = [v for s in stats_list for v in s["unique_recall_values"]]
    summary = {
        "files_processed": len(stats_list),
        "files_with_data": sum(1 for s in stats_list if s["values"]),
        "num_recalls": {
            "total_records": len(all_values),
            "average": (sum(all_values) / len(all_values)
                        if all_values else None),
            "minimum": min(all_values) if all_values else None,
            "maximum": max(all_values) if all_values else None,
        },
        "unique_recalls": {
            "total_records": len(all_uniques),
            "average": (sum(all_uniques) / len(all_uniques)
                        if all_uniques else None),
            "minimum": min(all_uniques) if all_uniques else None,
            "maximum": max(all_uniques) if all_uniques else None,
        },
        "per_file": stats_list,
    }
    if out_path:
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(summary, f, indent=2)
    return summary


def plot_experiments(rows: List[Dict], out_dir: str,
                     metrics: Sequence[str] = ("avg_hit_rate", "avg_chunk")
                     ) -> List[str]:
    """Grouped bar charts of each metric across versions x experiments —
    one PNG per metric, mirroring the reference collectors' matplotlib
    output (collect_all_datasets.py:15-103, collect_financebench.py:10-84).
    Returns the written paths."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if not rows:
        return []
    versions = sorted({r["version"] for r in rows})
    experiments = sorted({r["experiment"] for r in rows})
    lookup = {(r["version"], r["experiment"]): r for r in rows}
    os.makedirs(out_dir, exist_ok=True)
    written: List[str] = []
    width = 0.8 / max(len(experiments), 1)
    x = np.arange(len(versions))
    for metric in metrics:
        fig, ax = plt.subplots(figsize=(max(6, 1.5 * len(versions)), 4))
        for e_i, experiment in enumerate(experiments):
            vals = [
                (lookup.get((v, experiment)) or {}).get(metric) or 0.0
                for v in versions]
            ax.bar(x + e_i * width, vals, width, label=experiment)
        ax.set_xticks(x + 0.4 - width / 2)
        ax.set_xticklabels(versions, rotation=30, ha="right")
        ax.set_ylabel(metric)
        ax.set_title(f"{metric} by version and experiment")
        ax.legend(fontsize=8)
        fig.tight_layout()
        path = os.path.join(out_dir, f"{metric}.png")
        fig.savefig(path, dpi=120)
        plt.close(fig)
        written.append(path)
    return written
