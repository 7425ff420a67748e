"""Trained-fixture quality pipeline: the in-repo contrastive encoder must
make cosine ranking semantically meaningful (non-degenerate cos@0.9 judge)
and the LoRA-trained reranker must beat chance — so the pinned goldens
actually bite on ranking regressions (round-2 verdict: a hash embedder
pins hit_rate_cos@0.9 at 0.0, which no regression can move)."""

import numpy as np
import pytest

from veritasfi_tpu.evals.quality_parity import (build_records,
                                                run_pipeline,
                                                train_fixture_encoder)

# slow tier: excluded from the default run (pytest.ini -m 'not slow');
# the full matrix runs with `pytest -m ""`
pytestmark = pytest.mark.slow


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


def test_graded_fixture_shape():
    """Each query plants 5 graded chunks (primary/near-dup 3, paraphrase 2,
    related 1, off-date 0 — the stale chunk answers WRONG, so it gets no
    credit) + hard lexical filler — the adversarial corpus the selection
    tripwires need."""
    records, facts, grades = build_records(0, n_queries=12, n_filler=30)
    assert len(records) == 12 * 5 + 30
    assert len(facts) == len(grades) == 12
    for (q, fact, primary), g in zip(facts, grades):
        assert sorted(g.values(), reverse=True) == [3.0, 3.0, 2.0, 1.0, 0.0]
        assert g[primary] == 3.0 and fact in primary
        texts = list(g)
        # the near-duplicate differs from the primary by ONE word
        assert sum(a != b for a, b in zip(primary.split(),
                                          texts[1].split())) == 1
        # the off-date duplicate keeps the fact shape but a stale year
        assert "2022" in texts[4] and "2024" not in texts[4]


def test_trained_encoder_separates_positives():
    _, facts, _ = build_records(0)
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
    # trained reranker must beat the random-ordering floor on the GRADED
    # fixture: 30-trial random permutations of the same candidate lists
    # score mean 0.331 / p95 0.376 / max 0.442 NDCG@10 (the graded gains
    # raise the floor well above r2's binary ~0.216); the 96-step model
    # trained with the graded positive set + the query's own hard
    # negatives lands ~0.71
    assert r["reranker"]["ndcg@10"] > 0.55, r["reranker"]
    # random MRR on this fixture is mean 0.456 / max 0.616 over 30 trials
    # (4-5 rel>0 chunks reach the candidate lists); trained lands ~0.86
    assert r["reranker"]["mrr"] > 0.7, r["reranker"]
    assert r["fixture"]["reranker_train"]["final_loss"] < \
        r["fixture"]["reranker_train"]["first_loss"]
    # precision@10 has headroom now (4 rel>0 chunks per query exist) but
    # separates weakly — random lands ~0.23 because any ordering of a
    # 20-candidate list surfaces some of them; NDCG/MRR above are the
    # ordering-sensitive tripwires, this just pins the old 0.1 floor gone
    assert r["reranker"]["precision@10"] > 0.12, r["reranker"]
    # selection tripwires — ablating the mechanism must FLIP the rate
    # (oracle rerank scores tie stale/near-dup with the primary, so the
    # time score / sim-dedup are the only thing standing between them and
    # the top-5; a regression in either mechanism reads as 1.0 here):
    sel = r["selection"]
    assert sel["queries_contested"] >= 8, sel
    assert sel["stale_rate_time"] < 0.2, sel
    assert sel["stale_rate_notime"] > 0.8, sel
    assert sel["dup_rate_dedup"] < 0.2, sel
    assert sel["dup_rate_nodedup"] > 0.8, sel
