"""Eval harness tests: IR metrics, hit judging, latency model, stress
stats, e2e artifacts."""

import json
import math
import os

import numpy as np
import pytest

from fake_brain import ScriptedBrain
from veritasfi_tpu.evals import (
    AnswerJudge,
    aggregate_hit_stats,
    calculate_ndcg,
    calculate_precision,
    calculate_recall,
    collect_recall,
    compute_rr,
    evaluate_answers,
    evaluate_reranker,
    hit_rate_eval,
    rewrite_dataset,
    simulate_latency,
)
from veritasfi_tpu.evals.latency_model import StageTimes
from veritasfi_tpu.evals.retrieval_eval import calculate_perplexity, judge_hits
from veritasfi_tpu.evals.stress import StressStats, retrieval_throughput
from veritasfi_tpu.models.hash_embedder import HashEmbedder
from veritasfi_tpu.serving.chat_manager import ChatManager
from veritasfi_tpu.serving.llm_client import FakeLLM

EMB = HashEmbedder(dim=96)


# -- IR metrics -----------------------------------------------------------
def test_ndcg():
    assert calculate_ndcg([1, 1, 1]) == 1.0
    assert calculate_ndcg([0, 0, 0]) == 0.0
    # one relevant at position 2 vs ideal position 1
    expected = (1 / math.log2(3)) / 1.0
    assert abs(calculate_ndcg([0, 1, 0]) - expected) < 1e-9


def test_rr_precision_recall():
    assert compute_rr([0, 0, 1]) == pytest.approx(1 / 3)
    assert compute_rr([0, 0, 0]) == 0.0
    assert calculate_precision([1, 0, 1, 0], 4) == 0.5
    assert calculate_recall([1, 0, 1], num_relevant=4, k=3) == 0.5


def test_evaluate_reranker_orders_by_scorer():
    samples = [{
        "query": "zeekr revenue",
        "candidates": ["zeekr revenue was 300M", "the cat sat",
                       "dogs bark loudly"],
        "ground_truth": ["zeekr revenue was 300M"],
    }]

    def good_scorer(pairs):
        return [1.0 if "revenue" in p else 0.0 for _, p in pairs]

    def bad_scorer(pairs):
        return [0.0 if "revenue" in p else 1.0 for _, p in pairs]

    good = evaluate_reranker(samples, good_scorer, EMB.encode, k=3,
                             threshold=0.99)
    bad = evaluate_reranker(samples, bad_scorer, EMB.encode, k=3,
                            threshold=0.99)
    assert good["mrr"] == 1.0
    assert bad["mrr"] < 1.0


# -- retrieval eval --------------------------------------------------------
def test_perplexity():
    assert calculate_perplexity([0.0, 0.0]) == 1.0
    assert calculate_perplexity([]) == float("inf")
    assert calculate_perplexity([-1.0]) == pytest.approx(math.e)


def test_judge_hits_methods():
    evidences = ["zeekr revenue was 300M in Q3"]
    chunks = ["zeekr revenue was 300M in Q3", "unrelated text entirely"]
    assert judge_hits(evidences, chunks, EMB.encode, method="cos",
                      sim_threshold=0.99) == [True]
    assert judge_hits(evidences, chunks, EMB.encode, method="string") == [True]
    assert judge_hits(["not present anywhere"], chunks, EMB.encode,
                      method="string") == [False]
    votes = iter([True, False, True])
    assert judge_hits(evidences, chunks, EMB.encode, method="llm",
                      llm_vote=lambda e, c: next(votes)) == [True]


def test_rewrite_and_recall_pipeline(tmp_path):
    from test_ensemble import make_corpus
    from veritasfi_tpu.retrieval.ensemble import EnsembleRetriever

    idx, bm25 = make_corpus(tmp_path, seed=21)
    retriever = EnsembleRetriever(idx, EMB.encode, bm25=bm25, k=5)
    brain = ScriptedBrain(rewrittens=["zeekr revenue margin"])
    cm = ChatManager("s", FakeLLM(brain), "m")
    records = rewrite_dataset(
        [{"question": "revenue?", "evidences": [idx.texts[0]]}], cm)
    assert records[0].rewrittens == ["zeekr revenue margin"]
    assert records[0].need_rag
    records = collect_recall(records, retriever, use_hyde=False)
    assert records[0].chunks
    results = hit_rate_eval(records, EMB.encode, method="cos",
                            sim_threshold=0.999)
    stats = aggregate_hit_stats(results, str(tmp_path / "statistic.json"))
    assert 0.0 <= stats["avg_hit_rate"] <= 1.0
    assert json.load(open(tmp_path / "statistic.json"))["num_samples"] == 1


# -- answer eval -----------------------------------------------------------
def test_answer_judge_and_summary():
    llm = FakeLLM(lambda messages, **kw: "Score: 0.75\nReason: partial")
    judge = AnswerJudge(llm, "judge-model")
    assert judge.score("faithfulness", "q", "a", context="ctx") == 0.75
    summary = evaluate_answers(
        [{"original_question": "q", "answer": "a", "reference": "r",
          "rag_info": [{"chunk_content": "ctx"}]}],
        judge)
    assert summary["faithfulness"] == 0.75
    assert summary["factual_correctness"] == 0.75


def test_answer_judge_retry_and_clamp():
    responses = iter(["garbage", "Score: 1.7\nReason: over"])
    llm = FakeLLM(lambda messages, **kw: next(responses))
    judge = AnswerJudge(llm, "m")
    assert judge.score("response_relevancy", "q", "a") == 1.0  # clamped


# -- latency model -----------------------------------------------------------
def test_latency_model_matches_reference_shape():
    out = simulate_latency(user_levels=(1, 5), n_requests=500, seed=1)
    # single user, 1 sub-q: ~2.45 + 4.0 + 4.7 = 11.15 (+- jitter, mix)
    assert 10.5 < out[1]["p50"] < 13.5
    # contention scales retrieve+rerank by users in the serialized model
    assert out[5]["p50"] > out[1]["p50"] + 10
    # continuous batching removes the users factor
    free = simulate_latency(user_levels=(5,), n_requests=500,
                            rerank_serialized=False, seed=1)
    assert free[5]["p50"] < out[5]["p50"]


def test_latency_model_custom_times():
    fast = StageTimes(rewrite_s=0.1, rewrite_jitter_s=0.0, hyde_s=0.1,
                      retrieve_rerank_s=0.05, answer_s=0.5, merge_s=0.1)
    out = simulate_latency(user_levels=(1,), times=fast, n_requests=200)
    assert out[1]["p50"] < 1.0


# -- stress ------------------------------------------------------------------
def test_stress_stats_warmup_window():
    s = StressStats(warm_up_s=10.0)
    s.add_call()
    assert s.snapshot()["in_warm_up"]
    s._start -= 11  # simulate elapsed warmup
    for _ in range(5):
        s.add_call()
    snap = s.snapshot()
    assert snap["total_inference_calls"] == 5
    assert snap["overall_rate"] > 0


def test_retrieval_throughput(tmp_path):
    from test_ensemble import make_corpus
    from veritasfi_tpu.retrieval.ensemble import EnsembleRetriever

    idx, bm25 = make_corpus(tmp_path, seed=22)
    retriever = EnsembleRetriever(idx, EMB.encode, bm25=bm25, k=3)
    out = retrieval_throughput(retriever, ["zeekr revenue", "stores europe"],
                               n_samples=6)
    assert out["samples_per_sec"] > 0
    assert out["p50_latency_s"] > 0


# -- e2e harness ---------------------------------------------------------------
def test_run_e2e_artifacts(tmp_path):
    from test_chat_service import hash_scorer
    from test_ensemble import make_corpus
    from veritasfi_tpu.retrieval.ensemble import EnsembleRetriever
    from veritasfi_tpu.serving.chat_service import ChatService
    from veritasfi_tpu.evals import load_questions, run_e2e

    idx, bm25 = make_corpus(tmp_path, seed=23)
    eng = EnsembleRetriever(idx, EMB.encode, bm25=bm25, k=4)
    brain = ScriptedBrain(rewrittens=["zeekr revenue question"])
    svc = ChatService(FakeLLM(brain), "m", [eng], hash_scorer)

    qfile = tmp_path / "qs.json"
    qfile.write_text(json.dumps([
        {"question": "what is revenue?", "answer": "300M"}]))
    questions = load_questions(str(qfile))
    arts = run_e2e(svc, [questions], str(tmp_path / "out"))
    assert len(arts) == 1
    art = arts[0]
    assert art["original_question"] == "what is revenue?"
    assert art["answer"].startswith("ANSWER_TO[")
    assert art["need_rag"] is True
    assert (tmp_path / "out" / "question_0_0.json").exists()


def test_load_questions_text(tmp_path):
    from veritasfi_tpu.evals import load_questions

    p = tmp_path / "qs.md"
    p.write_text("# header\nquestion one\n\nquestion two\n")
    qs = load_questions(str(p))
    assert [q["question"] for q in qs] == ["question one", "question two"]


def test_collect_experiments(tmp_path):
    from veritasfi_tpu.evals.retrieval_eval import collect_experiments

    for version in ("20_chunks", "40_chunks"):
        for exp in ("faiss", "faiss_bm25"):
            d = tmp_path / version / exp
            d.mkdir(parents=True)
            (d / "statistic.json").write_text(json.dumps(
                {"avg_hit_rate": 0.8, "avg_chunk": 12.5, "num_samples": 10}))
    rows = collect_experiments(str(tmp_path), str(tmp_path / "out.csv"))
    assert len(rows) == 4
    assert rows[0]["version"] == "20_chunks"
    csv_text = (tmp_path / "out.csv").read_text()
    assert "avg_hit_rate" in csv_text and "faiss_bm25" in csv_text


def test_collect_num_recalls(tmp_path):
    """num_recalls + unique-recall aggregation over a result-file tree
    (reference collect_num_recalls.py:57-129): explicit reference-shape
    fields AND our native record shape (derived from ``chunks``), JSON list
    and JSONL both accepted, per-file + overall stats."""
    from veritasfi_tpu.evals.retrieval_eval import (collect_num_recalls,
                                                    summarize_num_recalls)

    # reference record shape: num_recalls + query_chunks (JSON list)
    a = tmp_path / "exp_a"
    a.mkdir()
    (a / "result.json").write_text(json.dumps([
        {"num_recalls": 4, "query_chunks": ["c1", "c2", "c2", "c3"]},
        {"num_recalls": 2, "query_chunks": ["c1", "c1"]},
        {"no_metrics_here": True},           # skipped, like the reference
    ]))
    # our native shape: chunks with content dicts (JSONL)
    b = tmp_path / "exp_b"
    b.mkdir()
    (b / "result.json").write_text(
        json.dumps({"chunks": [{"content": "x"}, {"content": "x"},
                               {"content": "y"}]}) + "\n" +
        json.dumps({"chunks": [{"content": "z"}]}) + "\n")
    # a file with no extractable data still produces a (count 0) row
    c = tmp_path / "exp_c"
    c.mkdir()
    (c / "result.json").write_text("[]")
    (c / "other.json").write_text("[]")      # filename mismatch: not walked

    stats = collect_num_recalls(str(tmp_path))
    assert [s["path"] for s in stats] == [
        "exp_a/result.json", "exp_b/result.json", "exp_c/result.json"]
    s_a, s_b, s_c = stats
    assert s_a["count"] == 2 and s_a["average"] == 3.0
    assert s_a["minimum"] == 2.0 and s_a["maximum"] == 4.0
    # unique-recall: sets over the chunk strings -> 3 and 1
    assert s_a["unique_recall_values"] == [3, 1]
    assert s_a["unique_recall_average"] == 2.0
    assert s_b["count"] == 2 and s_b["values"] == [3.0, 1.0]
    assert s_b["unique_recall_values"] == [2, 1]
    assert s_c["count"] == 0 and s_c["average"] is None

    out = tmp_path / "num_recalls_summary.json"
    summary = summarize_num_recalls(stats, out_path=str(out))
    assert summary["files_processed"] == 3
    assert summary["files_with_data"] == 2
    assert summary["num_recalls"]["total_records"] == 4
    assert summary["num_recalls"]["average"] == pytest.approx(10 / 4)
    assert summary["unique_recalls"]["minimum"] == 1
    assert summary["unique_recalls"]["maximum"] == 3
    on_disk = json.loads(out.read_text())
    assert on_disk["num_recalls"] == summary["num_recalls"]


def test_stress_test_threads():
    from veritasfi_tpu.evals import stress_test

    calls = []

    def workload():
        calls.append(1)

    out = stress_test(workload, num_threads=2, duration_s=0.6,
                      warm_up_s=0.1)
    assert out["total_inference_calls"] > 0
    assert out["overall_rate"] > 0


def test_plot_experiments(tmp_path):
    """Chart emission parity with the reference collectors (grouped bars of
    avg_hit_rate / avg_chunk across versions x experiments)."""
    from veritasfi_tpu.evals.retrieval_eval import (collect_experiments,
                                                    plot_experiments)

    for version in ("20_chunks", "40_chunks"):
        for exp in ("faiss", "faiss_bm25"):
            d = tmp_path / "root" / version / exp
            d.mkdir(parents=True)
            (d / "statistic.json").write_text(json.dumps({
                "avg_hit_rate": 0.5, "avg_chunk": 12.0, "num_samples": 4}))
    rows = collect_experiments(str(tmp_path / "root"))
    paths = plot_experiments(rows, str(tmp_path / "charts"))
    assert len(paths) == 2
    for p in paths:
        assert os.path.exists(p) and os.path.getsize(p) > 1000


def test_rewrite_dataset_parallel_matches_serial():
    """Thread-pool fan-out (reference: datasets.map num_proc=16) keeps
    dataset order and per-sample outputs."""
    from fake_brain import ScriptedBrain
    from veritasfi_tpu.evals.retrieval_eval import rewrite_dataset
    from veritasfi_tpu.serving.chat_manager import ChatManager
    from veritasfi_tpu.serving.llm_client import FakeLLM

    samples = [{"question": f"question {i}?", "evidences": [f"e{i}"]}
               for i in range(7)]

    def factory():
        return ChatManager("rw", FakeLLM(ScriptedBrain()), "m",
                           scorer=lambda pairs: [0.0] * len(pairs))

    serial = rewrite_dataset(samples, chat_manager=factory())
    parallel = rewrite_dataset(samples, num_workers=3,
                               chat_manager_factory=factory)
    assert [r.question for r in parallel] == [r.question for r in serial]
    assert [r.rewrittens for r in parallel] == [r.rewrittens for r in serial]
    assert [r.need_rag for r in parallel] == [r.need_rag for r in serial]


def test_hyde_is_per_rewritten(tmp_path):
    """Retrieval for sub-question A must use only A's HyDE docs, not the
    accumulated list across all rewrittens."""
    from veritasfi_tpu.evals.retrieval_eval import hyde_with_perplexity

    brain = ScriptedBrain(rewrittens=["sub question one",
                                      "sub question two"])
    cm = ChatManager("s", FakeLLM(brain), "m")
    records = rewrite_dataset([{"question": "two things?"}], cm)
    records = hyde_with_perplexity(records, cm)
    rec = records[0]
    assert set(rec.hyde_by_rewritten) == {"sub question one",
                                          "sub question two"}
    per = [len(v) for v in rec.hyde_by_rewritten.values()]
    assert sum(per) == len(rec.hyde)

    class SpyRetriever:
        def __init__(self):
            self.calls = []

        def invoke(self, q, hyde):
            self.calls.append((q, list(hyde)))
            return []

    spy = SpyRetriever()
    collect_recall(records, spy, use_hyde=True)
    assert len(spy.calls) == 2
    for q, hyde in spy.calls:
        assert hyde == rec.hyde_by_rewritten[q]


def test_judge_llm_without_vote_raises_early():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        judge_hits(["e"], ["c"], EMB.encode, method="llm")
