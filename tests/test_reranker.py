import jax.numpy as jnp
import numpy as np
import pytest

from veritasfi_tpu.models.reranker import (
    DECODER_PRESETS,
    CrossEncoderReranker,
    DecoderArch,
    FlaxDecoderLM,
    yes_logit_score,
)

# slow tier: excluded from the default run (pytest.ini -m 'not slow');
# the full matrix runs with `pytest -m ""`
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def rr():
    return CrossEncoderReranker(preset="tiny-test", seed=0)


def test_compute_score_api(rr):
    pairs = [["what is revenue", "revenue was 300M"],
             ["what is revenue", "the cat sat"]]
    scores = rr.compute_score(pairs, batch_size=8)
    assert len(scores) == 2
    assert all(isinstance(s, float) for s in scores)
    # deterministic
    assert scores == rr.compute_score(pairs, batch_size=1)


def test_padding_invariance(rr):
    """Yes-logit must not depend on right padding (true-last-position gather)."""
    row = rr.encode_pair("q", "short passage")
    alone = rr.score_tokens([row])
    long_row = rr.encode_pair("q", "much longer passage " * 30)
    together = rr.score_tokens([row, long_row])
    np.testing.assert_allclose(alone[0], together[0], atol=1e-4)


def test_pair_truncation(rr):
    """passage_max_length is the ROW cap (it sizes every serve-path
    compile bucket): the budget subtracts prefix AND suffix, so finished
    rows never exceed it — for any query/passage length."""
    long_passage = "tok " * 5000
    row = rr.encode_pair("q", long_passage)
    assert len(row) <= rr.passage_max_length
    row = rr.encode_pair("why " * 3000, long_passage)
    assert len(row) <= rr.passage_max_length


def test_query_max_length_honored():
    """query_max_length (train_bge_rr.sh:19) actually truncates the query
    — it was a silent no-op; the 3/4-row ceiling still applies so a huge
    configured cap cannot starve the passage."""
    rr = CrossEncoderReranker(preset="tiny-test", seed=0,
                              query_max_length=8, passage_max_length=128)
    prefix, budget, suffix = rr.pair_layout("word " * 200)
    # prefix = [bos] + query_ids + sep
    assert len(prefix) <= 1 + 8 + len(rr._sep_ids)
    big = CrossEncoderReranker(preset="tiny-test", seed=0,
                               query_max_length=10_000,
                               passage_max_length=64)
    prefix, _, _ = big.pair_layout("word " * 200)
    assert len(prefix) <= 1 + 64 * 3 // 4 + len(big._sep_ids)


def test_decoder_score_and_sim_empty(rr):
    """Zero rerank candidates (empty corpus / all filtered) must return
    empty outputs, not crash on max() of an empty sequence — parity with
    EncoderReranker.score_and_sim."""
    scores, sim = rr.score_and_sim([], np.zeros((0, 8), np.float32))
    assert scores.shape == (0,)
    assert sim.shape == (0, 0)


def test_default_eos_is_gemma_eos():
    """Gemma vocab: <pad>=0, <eos>=1, <bos>=2, <unk>=3. The default stop
    token (caller passes eos_id=None) must be <eos>=1, not bos+1=<unk>=3
    — with bos+1 a real checkpoint's generations never stop."""
    assert DecoderArch().eos_id == 1
    from veritasfi_tpu.models.generate import Generator

    rr2 = CrossEncoderReranker(preset="tiny-test", seed=0)
    gen = Generator(rr2.module, rr2.params, max_prompt_len=16,
                    max_new_tokens=4, cache_dtype=jnp.float32)
    with_default = gen.generate_tokens([[5, 6, 7]], max_new_tokens=4)[0]
    explicit = gen.generate_tokens([[5, 6, 7]], max_new_tokens=4,
                                   eos_id=rr2.arch.eos_id)[0]
    assert with_default == explicit


def test_empty_pairs(rr):
    assert rr.compute_score([], batch_size=8) == []


def test_gqa_repeat_shapes():
    arch = DecoderArch(vocab_size=128, hidden=32, layers=1, heads=4,
                       kv_heads=2, head_dim=8, intermediate=64)
    import jax

    m = FlaxDecoderLM(arch)
    ids = jnp.zeros((2, 8), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), ids, jnp.ones_like(ids))
    out = m.apply(params, ids, jnp.ones_like(ids))
    assert out.shape == (2, 8, 128)


@pytest.mark.slow
def test_parity_with_hf_gemma():
    """FlaxDecoderLM must reproduce HF GemmaForCausalLM logits (weight
    conversion + RoPE/RMSNorm/GeGLU/MQA correctness)."""
    torch = pytest.importorskip("torch")
    from transformers import GemmaConfig, GemmaForCausalLM

    from veritasfi_tpu.models.hf_loader import load_gemma_params

    cfg = GemmaConfig(
        vocab_size=96, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=1, head_dim=8,
        intermediate_size=64, max_position_embeddings=64,
        attn_implementation="eager", hidden_activation="gelu_pytorch_tanh",
    )
    torch.manual_seed(0)
    model = GemmaForCausalLM(cfg).eval()

    arch = DecoderArch(vocab_size=96, hidden=32, layers=2, heads=4,
                       kv_heads=1, head_dim=8, intermediate=64)
    params = load_gemma_params(model.state_dict(), arch)

    ids = np.array([[2, 5, 9, 11, 17, 23]], np.int32)
    mask = np.ones_like(ids)
    with torch.no_grad():
        hf_logits = model(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        ).logits.float().numpy()

    ours = FlaxDecoderLM(arch).apply(params, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(ours), hf_logits, atol=3e-4)

    # yes-logit extraction matches logits[:, -1, yes]
    yes_id = 42
    s = yes_logit_score(FlaxDecoderLM(arch), params, jnp.asarray(ids),
                        jnp.asarray(mask), yes_id)
    np.testing.assert_allclose(np.asarray(s), hf_logits[:, -1, yes_id], atol=3e-4)


def test_encoder_reranker_clamps_to_position_table():
    """XLM-R presets have 514 positions (offset 2); longer configured pair
    lengths must clamp instead of silently gathering clamped position
    embeddings."""
    from veritasfi_tpu.models.encoder_reranker import EncoderReranker

    rr = EncoderReranker(preset="bge-reranker-base", query_max_length=512,
                         passage_max_length=1024)
    assert rr.passage_max_length == 512
    prefix, budget, suffix = rr.pair_layout("short query")
    assert len(prefix) + max(budget, 0) + len(suffix) <= 512


def test_encoder_reranker_score_and_sim_empty():
    import numpy as np

    from veritasfi_tpu.models.encoder_reranker import EncoderReranker

    rr = EncoderReranker(preset="tiny-test")
    scores, sim = rr.score_and_sim([], np.zeros((0, 8), np.float32))
    assert scores.shape == (0,) and sim.shape == (0, 0)
