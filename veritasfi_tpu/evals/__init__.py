from .retrieval_eval import (
    RewriteRecord,
    aggregate_hit_stats,
    collect_num_recalls,
    collect_recall,
    hit_rate_eval,
    hyde_with_perplexity,
    rewrite_dataset,
    summarize_num_recalls,
)
from .reranker_eval import (
    calculate_ndcg,
    calculate_precision,
    calculate_recall,
    compute_rr,
    evaluate_reranker,
    sweep_checkpoints,
)
from .annotate import load_groups, mine_training_groups, save_groups
from .answer_eval import AnswerJudge, evaluate_answers
from .e2e_qa import load_questions, run_e2e
from .latency_model import simulate_latency
from .stress import retrieval_throughput, stress_test

__all__ = [
    "rewrite_dataset", "hyde_with_perplexity", "collect_recall",
    "hit_rate_eval", "aggregate_hit_stats", "RewriteRecord",
    "collect_num_recalls", "summarize_num_recalls",
    "calculate_ndcg", "compute_rr", "calculate_precision",
    "calculate_recall", "evaluate_reranker", "sweep_checkpoints",
    "AnswerJudge", "evaluate_answers", "simulate_latency",
    "stress_test", "retrieval_throughput", "load_questions", "run_e2e",
    "mine_training_groups", "save_groups", "load_groups",
]
