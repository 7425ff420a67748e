"""LoRA reranker training: loss behavior, frozen base, mesh sharding,
checkpointing."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from veritasfi_tpu.models.reranker import DECODER_PRESETS, DecoderArch
from veritasfi_tpu.parallel import make_mesh
from veritasfi_tpu.train import (
    LoRATrainConfig,
    RerankerTrainer,
    anonymize_company,
    group_loss,
)

# slow tier: excluded from the default run (pytest.ini -m 'not slow');
# the full matrix runs with `pytest -m ""`
pytestmark = pytest.mark.slow

TINY = dataclasses.replace(DECODER_PRESETS["tiny-test"], lora_rank=4,
                           lora_alpha=8.0)


def make_groups(n, group_size, seed=0):
    rng = np.random.default_rng(seed)
    groups = []
    for i in range(n):
        q = f"question about topic {i % 3} metric {i % 5}"
        pos = f"topic {i % 3} metric {i % 5} value is {rng.integers(100)}"
        negs = [f"unrelated text {rng.integers(1000)} noise {j}"
                for j in range(group_size - 1)]
        groups.append((q, [pos] + negs))
    return groups


def test_group_loss_prefers_positive():
    logits = jnp.asarray([5.0, 0.0, 0.0, 0.0])
    good = group_loss(logits, 4)
    bad = group_loss(jnp.asarray([0.0, 5.0, 0.0, 0.0]), 4)
    assert float(good) < float(bad)


def test_anonymize():
    assert anonymize_company("Zeekr's revenue grew; ZEEKR delivered") == \
        "the Company revenue grew; the Company delivered"


@pytest.fixture(scope="module")
def trainer():
    cfg = LoRATrainConfig(group_size=4, total_steps=20, save_every=0)
    return RerankerTrainer(arch=TINY, config=cfg)


def test_loss_decreases(trainer):
    groups = make_groups(4, 4)
    ids, mask = trainer.make_batch(groups)
    losses = [trainer.train_step(ids, mask) for _ in range(8)]
    assert losses[-1] < losses[0]


def test_only_lora_params_change(trainer):
    before = jax.tree_util.tree_leaves_with_path(trainer.params)
    snapshot = {jax.tree_util.keystr(p): np.asarray(v).copy()
                for p, v in before}
    ids, mask = trainer.make_batch(make_groups(2, 4, seed=1))
    trainer.train_step(ids, mask)
    after = {jax.tree_util.keystr(p): np.asarray(v)
             for p, v in jax.tree_util.tree_leaves_with_path(trainer.params)}
    for key, old in snapshot.items():
        changed = not np.allclose(old, after[key])
        is_lora = "lora" in key
        if is_lora and "lora_a" in key:
            continue  # lora_a only moves once lora_b is nonzero
        if not is_lora:
            assert not changed, f"frozen param changed: {key}"


def test_lora_b_starts_zero_so_base_scores_unchanged():
    base = RerankerTrainer(arch=TINY,
                           config=LoRATrainConfig(group_size=4, total_steps=5))
    plain = DECODER_PRESETS["tiny-test"]
    from veritasfi_tpu.models.reranker import CrossEncoderReranker

    # same seed, no lora
    rr_plain = CrossEncoderReranker(arch=plain, seed=0)
    pairs = [["query text", "passage text"]]
    # lora(B=0) must not change the function: compare reranker inside trainer
    s_lora = base.reranker.compute_score(pairs)
    # params differ in init RNG split; just assert finite + deterministic
    assert np.isfinite(s_lora).all()
    assert s_lora == base.reranker.compute_score(pairs)
    assert np.isfinite(rr_plain.compute_score(pairs)).all()


def test_checkpoint_roundtrip(trainer, tmp_path):
    ids, mask = trainer.make_batch(make_groups(2, 4, seed=2))
    trainer.train_step(ids, mask)
    path = trainer.save_checkpoint(str(tmp_path / "ckpt"))
    step = trainer.step_count
    params_before = jax.tree_util.tree_map(np.asarray, trainer.params)
    trainer.train_step(ids, mask)  # mutate
    trainer.restore_checkpoint(path)
    assert trainer.step_count == step
    restored = jax.tree_util.tree_map(np.asarray, trainer.params)
    jax.tree_util.tree_map(np.testing.assert_array_equal, params_before,
                           restored)


def test_mesh_sharded_training_step():
    """Full dp x tp sharded train step on the 8-device CPU mesh."""
    mesh = make_mesh([("data", 4), ("model", 2)])
    cfg = LoRATrainConfig(group_size=4, total_steps=5)
    trainer = RerankerTrainer(arch=TINY, config=cfg, mesh=mesh)
    ids, mask = trainer.make_batch(make_groups(4, 4))  # 16 rows over dp=4
    losses = [trainer.train_step(ids, mask) for _ in range(4)]
    assert all(np.isfinite(l) for l in losses)
    # warmup step 0 has lr=0, so compare after the schedule kicks in
    assert losses[-1] < losses[0]


def test_cli_train_reranker(tmp_path):
    """End-to-end CLI training run: JSONL data -> LoRA steps -> checkpoint."""
    import json as _json

    from veritasfi_tpu.cli import main

    data = tmp_path / "train.jsonl"
    rows = [{"query": f"metric {i} question",
             "pos": [f"passage answering metric {i}"],
             "neg": [f"unrelated text {j}" for j in range(3)]}
            for i in range(4)]
    data.write_text("\n".join(_json.dumps(r) for r in rows))
    out = tmp_path / "ckpt"
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["train-reranker", "--data", str(data),
                   "--out-dir", str(out), "--steps", "2",
                   "--groups-per-batch", "1", "--group-size", "4",
                   "--preset", "tiny-test", "--lr", "1e-3"])
    assert rc == 0
    res = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert res["steps"] == 2
    assert res["final_loss"] is not None
    import os

    assert os.path.isdir(res["checkpoint"])


def test_base_params_without_lora_adapters_train():
    """load_gemma_params-style trees carry no lora_a/b leaves; the trainer
    must graft fresh adapters on (using the tree verbatim raised
    ScopeParamNotFoundError and froze everything)."""
    import dataclasses

    import jax

    from veritasfi_tpu.models.reranker import (DECODER_PRESETS,
                                               CrossEncoderReranker)
    from veritasfi_tpu.train.reranker_lora import (LoRATrainConfig,
                                                   RerankerTrainer)

    base_arch = dataclasses.replace(DECODER_PRESETS["tiny-test"],
                                    lora_rank=0)
    pretrained = CrossEncoderReranker(arch=base_arch, seed=3).params
    lora_arch = dataclasses.replace(base_arch, lora_rank=4, lora_alpha=8.0)
    tr = RerankerTrainer(arch=lora_arch,
                         config=LoRATrainConfig(group_size=2, total_steps=4),
                         base_params=pretrained)
    ids, mask = tr.make_batch([("q one", ["pos passage", "neg passage"])])
    loss = tr.train_step(ids, mask)
    assert jax.numpy.isfinite(loss)
    # trainer's embedded reranker scores with CURRENT weights
    assert tr.reranker.params is tr.params


def test_checkpoint_same_step_twice_no_crash(trainer, tmp_path):
    ids, mask = trainer.make_batch(
        [("q", [f"p{i}" for i in range(trainer.config.group_size)])])
    trainer.train_step(ids, mask)
    p1 = trainer.save_checkpoint(str(tmp_path / "ck"))
    p2 = trainer.save_checkpoint(str(tmp_path / "ck"))
    assert p1 == p2


def test_restore_preserves_opt_state(trainer, tmp_path):
    import numpy as np

    ids, mask = trainer.make_batch(
        [("q", [f"p{i}" for i in range(trainer.config.group_size)])])
    trainer.train_step(ids, mask)
    path = trainer.save_checkpoint(str(tmp_path / "ck2"))
    before = jax.tree_util.tree_leaves(trainer.opt_state)
    trainer.restore_checkpoint(path)
    after = jax.tree_util.tree_leaves(trainer.opt_state)
    assert len(before) == len(after)
    # Adam moments survive the round-trip (not re-zeroed)
    nonzero = [np.asarray(x) for x in after
               if hasattr(x, "shape") and np.asarray(x).size
               and np.abs(np.asarray(x, np.float64)).sum() > 0]
    assert nonzero, "restored opt_state is all zeros"


def test_anonymize_escapes_regex_metacharacters():
    from veritasfi_tpu.train.reranker_lora import anonymize_company

    out = anonymize_company("Yahoo! and A.B. Corp results", "A.B. Corp")
    assert out == "Yahoo! and the Company results"
    # '.' must not act as a wildcard
    assert anonymize_company("AxBx Corp", "A.B. Corp") == "AxBx Corp"
