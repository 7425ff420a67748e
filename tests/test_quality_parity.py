"""Trained-fixture quality pipeline: the in-repo contrastive encoder must
make cosine ranking semantically meaningful (non-degenerate cos@0.9 judge)
and the LoRA-trained reranker must beat chance — so the pinned goldens
actually bite on ranking regressions (round-2 verdict: a hash embedder
pins hit_rate_cos@0.9 at 0.0, which no regression can move)."""

import numpy as np

from veritasfi_tpu.evals.quality_parity import (build_records,
                                                run_pipeline,
                                                train_fixture_encoder)


def test_fit_epoch_covers_all_pairs_without_duplicates():
    """fit() must consume each epoch's full permutation: no sample dropped
    at the epoch boundary (len(pairs) % batch_size remainder), no
    duplicate positives within a batch (they corrupt in-batch-negative
    labels), and the pop sequence unchanged when batch_size divides
    len(pairs) (the goldens pin that trajectory)."""
    from veritasfi_tpu.train.contrastive import ContrastiveTrainer

    pairs = [(f"q{i}", f"d{i}") for i in range(10)]
    seen_batches = []

    t = object.__new__(ContrastiveTrainer)
    t.make_batch = lambda batch: (batch,)
    t.train_step = lambda batch: seen_batches.append(
        [int(q[1:]) for q, _ in batch]) or 0.0

    # non-dividing batch size: 3 batches = 12 draws over 10 pairs
    t.fit(pairs, steps=10, batch_size=4, seed=0)
    flat = [i for b in seen_batches for i in b]
    counts = np.bincount(flat, minlength=10)
    # 40 draws over 10 pairs -> every pair exactly 4 times (no drops)
    assert counts.tolist() == [4] * 10, counts
    for b in seen_batches:
        assert len(set(b)) == len(b), f"duplicate in batch {b}"

    # dividing batch size: identical to the old drop-remainder pop order
    seen_batches.clear()
    t.fit(pairs, steps=4, batch_size=5, seed=3)
    rng = np.random.default_rng(3)
    expect = []
    order = []
    for _ in range(4):
        if len(order) < 5:
            order = list(rng.permutation(10))
        expect.append([int(order.pop()) for _ in range(5)])
    assert seen_batches == expect


def test_trained_encoder_separates_positives():
    _, facts = build_records(0)
    enc, diag = train_fixture_encoder(facts, encoder_steps=60, seed=0)
    assert diag["mean_cos_q_pos"] > 0.8, diag
    # positives score far above a mismatched (question, other-chunk) pair
    q_emb = enc.encode([q for q, _, _ in facts[:8]])
    c_emb = enc.encode([c for _, _, c in facts[:8]])
    pos = np.sum(q_emb * c_emb, axis=1)
    neg = q_emb @ c_emb.T
    np.fill_diagonal(neg, -1.0)
    assert (pos > neg.max(axis=1) + 0.05).mean() >= 0.75


def test_pipeline_fast_metrics_bite():
    # 96 full-fine-tune steps: enough for positives to rank top-3 on the
    # fixture (measured); LoRA-only on the random base plateaus at NDCG
    # ~0.4 and 16-48 steps are half-trained — see train_fixture_reranker
    r = run_pipeline(seed=0, encoder_steps=60, reranker_steps=96)
    # the cos-judged hit rate is the round-2 weakness: it must be
    # NON-ZERO so a ranking regression can move it
    assert r["retrieval"]["hit_rate_cos@0.9"] > 0.5, r["retrieval"]
    assert r["retrieval"]["hit_rate_string"] > 0.9, r["retrieval"]
    # trained reranker must beat the random-reranker floor (~0.216 in r2)
    assert r["reranker"]["ndcg@10"] > 0.5, r["reranker"]
    # fast-path (96-step) MRR lands ~0.46; the random/under-trained floor
    # is ~0.14-0.27, so 0.4 separates learned from broken
    assert r["reranker"]["mrr"] > 0.4, r["reranker"]
    assert r["fixture"]["reranker_train"]["final_loss"] < \
        r["fixture"]["reranker_train"]["first_loss"]
