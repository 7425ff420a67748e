"""Qwen-family decoder support: arch mapping, forward parity with HF
Qwen2/Qwen3, untied LM head, last-token-pooling decoder embedder.

The reference serves its chat LLM from the Qwen line
(Qwen2.5-72B-Instruct-AWQ, reference config/example.yaml:5) and judges
retrieval hit-rate with Qwen3-Embedding-4B last-token pooling
(experiments/retriever/step3_mul.py:181-209,384).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from veritasfi_tpu.models.hf_loader import (decoder_arch_from_config,
                                            load_decoder_params)
from veritasfi_tpu.models.reranker import (DECODER_PRESETS, DecoderArch,
                                           FlaxDecoderLM)

# slow tier: excluded from the default run (pytest.ini -m 'not slow');
# the full matrix runs with `pytest -m ""`
pytestmark = pytest.mark.slow

QWEN_TINY = DecoderArch(
    vocab_size=512, hidden=32, layers=2, heads=4, kv_heads=2, head_dim=8,
    intermediate=64, rope_theta=1e6, embed_scale=False, rms_plus_one=False,
    attn_bias=True, mlp_act="silu", tied_head=False, add_bos=False)


def _init(module, seq=8):
    ids = jnp.zeros((1, seq), jnp.int32)
    return module.init(jax.random.PRNGKey(0), ids, jnp.ones_like(ids))


# ---------------------------------------------------------------------------
# arch mapping from HF config.json
# ---------------------------------------------------------------------------
def test_arch_from_qwen2_config():
    cfg = {"model_type": "qwen2", "vocab_size": 151936, "hidden_size": 896,
           "num_hidden_layers": 24, "num_attention_heads": 14,
           "num_key_value_heads": 2, "intermediate_size": 4864,
           "rope_theta": 1e6, "rms_norm_eps": 1e-6,
           "tie_word_embeddings": True, "eos_token_id": 151645}
    a = decoder_arch_from_config(cfg)
    assert a.attn_bias and a.mlp_act == "silu" and not a.qk_norm
    assert not a.embed_scale and not a.rms_plus_one and not a.add_bos
    assert a.head_dim == 896 // 14 and a.tied_head
    assert a.eos_id == 151645


def test_arch_from_qwen3_config():
    cfg = {"model_type": "qwen3", "hidden_size": 1024,
           "num_hidden_layers": 28, "num_attention_heads": 16,
           "num_key_value_heads": 8, "head_dim": 128,
           "intermediate_size": 3072, "tie_word_embeddings": True}
    a = decoder_arch_from_config(cfg)
    assert a.qk_norm and not a.attn_bias and a.mlp_act == "silu"
    assert a.head_dim == 128


def test_arch_from_gemma_config_unchanged():
    a = decoder_arch_from_config({"model_type": "gemma"})
    assert a.embed_scale and a.rms_plus_one and a.add_bos
    assert not a.attn_bias and a.mlp_act == "gelu" and a.tied_head


def test_arch_rejects_unknown_family():
    with pytest.raises(ValueError):
        decoder_arch_from_config({"model_type": "llama"})


# ---------------------------------------------------------------------------
# forward: untied head, qk_norm, logit_ids
# ---------------------------------------------------------------------------
def test_untied_head_forward_and_logit_ids():
    module = FlaxDecoderLM(QWEN_TINY)
    params = _init(module)
    assert "lm_head" in params["params"]
    ids = jnp.asarray(np.random.default_rng(0).integers(
        1, 128, size=(2, 6)).astype(np.int32))
    mask = jnp.ones_like(ids)
    full = module.apply(params, ids, mask)
    assert full.shape == (2, 6, 512)
    sel = module.apply(params, ids, mask, logit_ids=jnp.asarray([5, 17]))
    np.testing.assert_allclose(np.asarray(sel[..., 0]),
                               np.asarray(full[..., 5]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sel[..., 1]),
                               np.asarray(full[..., 17]), atol=1e-5)


def test_qwen_cached_decode_matches_full():
    """KV-cached decode parity must hold for the Qwen path too (attention
    biases + qk_norm are applied before the cache write)."""
    from veritasfi_tpu.models.generate import init_cache

    import dataclasses

    arch = dataclasses.replace(QWEN_TINY, qk_norm=True)
    module = FlaxDecoderLM(arch)
    params = _init(module)
    rng = np.random.default_rng(1)
    ids = rng.integers(1, 128, size=(2, 9)).astype(np.int32)
    mask = np.ones_like(ids)
    full = module.apply(params, jnp.asarray(ids), jnp.asarray(mask))

    cache = init_cache(arch, 2, 12)
    cache = [(k, v, km.at[:, :5].set(True)) for k, v, km in cache]
    positions = jnp.arange(5)[None, :].repeat(2, 0)
    logits, cache = module.apply(params, jnp.asarray(ids[:, :5]),
                                 jnp.ones((2, 5), jnp.int32), cache=cache,
                                 cache_offset=0, positions=positions)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full[:, :5]),
                               atol=2e-4)
    for t in range(5, 9):
        cache = [(k, v, km.at[:, t].set(True)) for k, v, km in cache]
        step, cache = module.apply(
            params, jnp.asarray(ids[:, t:t + 1]), jnp.ones((2, 1), jnp.int32),
            cache=cache, cache_offset=t,
            positions=jnp.full((2, 1), t, jnp.int32))
        np.testing.assert_allclose(np.asarray(step[:, 0]),
                                   np.asarray(full[:, t]), atol=2e-4,
                                   err_msg=f"step {t}")


def test_qwen_presets_registered():
    for name in ("qwen2.5-0.5b", "qwen2.5-7b", "qwen3-embedding-0.6b"):
        a = DECODER_PRESETS[name]
        assert a.mlp_act == "silu" and not a.add_bos
    assert DECODER_PRESETS["qwen2.5-7b"].tied_head is False
    assert DECODER_PRESETS["qwen3-embedding-0.6b"].qk_norm is True


# ---------------------------------------------------------------------------
# HF parity (weight conversion + architecture correctness)
# ---------------------------------------------------------------------------
@pytest.mark.slow
def test_parity_with_hf_qwen2():
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config, Qwen2ForCausalLM

    cfg = Qwen2Config(
        vocab_size=96, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=64, max_position_embeddings=64,
        rope_theta=1e6, tie_word_embeddings=False,
        attn_implementation="eager")
    torch.manual_seed(0)
    model = Qwen2ForCausalLM(cfg).eval()

    arch = decoder_arch_from_config(cfg.to_dict())
    assert arch.attn_bias and not arch.tied_head
    params = load_decoder_params(model.state_dict(), arch)
    module = FlaxDecoderLM(arch)

    ids = np.array([[5, 9, 11, 17, 23, 42]], np.int32)
    mask = np.ones_like(ids)
    with torch.no_grad():
        hf = model(input_ids=torch.tensor(ids, dtype=torch.long),
                   attention_mask=torch.tensor(mask, dtype=torch.long)
                   ).logits.float().numpy()
    ours = np.asarray(module.apply(params, jnp.asarray(ids),
                                   jnp.asarray(mask)))
    np.testing.assert_allclose(ours, hf, atol=2e-4)


@pytest.mark.slow
def test_parity_with_hf_qwen3():
    torch = pytest.importorskip("torch")
    from transformers import Qwen3Config, Qwen3ForCausalLM

    cfg = Qwen3Config(
        vocab_size=96, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        intermediate_size=64, max_position_embeddings=64,
        rope_theta=1e6, tie_word_embeddings=True,
        attn_implementation="eager")
    torch.manual_seed(0)
    model = Qwen3ForCausalLM(cfg).eval()

    arch = decoder_arch_from_config(cfg.to_dict())
    assert arch.qk_norm and not arch.attn_bias
    params = load_decoder_params(model.state_dict(), arch)
    module = FlaxDecoderLM(arch)

    ids = np.array([[5, 9, 11, 17, 23, 42]], np.int32)
    mask = np.ones_like(ids)
    with torch.no_grad():
        hf = model(input_ids=torch.tensor(ids, dtype=torch.long),
                   attention_mask=torch.tensor(mask, dtype=torch.long)
                   ).logits.float().numpy()
    ours = np.asarray(module.apply(params, jnp.asarray(ids),
                                   jnp.asarray(mask)))
    np.testing.assert_allclose(ours, hf, atol=2e-4)


@pytest.mark.slow
def test_embedder_parity_with_hf_qwen3_hidden():
    """DecoderEmbedder must reproduce HF's normalized last-hidden pooling
    (the judge mechanism, step3_mul.py:181-209)."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen3Config, Qwen3ForCausalLM

    from veritasfi_tpu.models.decoder_embedder import DecoderEmbedder

    cfg = Qwen3Config(
        vocab_size=96, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        intermediate_size=64, max_position_embeddings=64,
        rope_theta=1e6, tie_word_embeddings=True,
        attn_implementation="eager")
    torch.manual_seed(0)
    model = Qwen3ForCausalLM(cfg).eval()
    arch = decoder_arch_from_config(cfg.to_dict())
    params = load_decoder_params(model.state_dict(), arch)
    emb = DecoderEmbedder(arch=arch, params=params, instruction=None)

    rows = [[5, 9, 11, 17], [23, 42]]
    ours = emb.encode_tokens(rows)
    for i, r in enumerate(rows):
        ids = torch.tensor([r], dtype=torch.long)
        with torch.no_grad():
            h = model.model(input_ids=ids).last_hidden_state[0, -1]
        h = (h / h.norm()).float().numpy()
        np.testing.assert_allclose(ours[i], h, atol=2e-4)


# ---------------------------------------------------------------------------
# decoder embedder semantics
# ---------------------------------------------------------------------------
def test_embedder_padding_invariance_and_norm():
    from veritasfi_tpu.models.decoder_embedder import DecoderEmbedder

    emb = DecoderEmbedder(arch=QWEN_TINY, instruction=None)
    rows = [[5, 9, 11, 17, 23], [7, 3]]
    both = emb.encode_tokens(rows)
    solo = np.concatenate([emb.encode_tokens([r]) for r in rows])
    np.testing.assert_allclose(both, solo, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(both, axis=-1), 1.0, atol=1e-5)


def test_embedder_query_instruction_framing():
    from veritasfi_tpu.models.decoder_embedder import DecoderEmbedder

    emb = DecoderEmbedder(arch=QWEN_TINY, instruction="find docs")
    q = np.asarray(emb.embed_query("revenue 2024"))
    d = np.asarray(emb.embed_documents(["revenue 2024"])[0])
    # queries are instruct-framed, documents raw -> different embeddings
    assert not np.allclose(q, d)
    raw = emb.encode(["Instruct: find docs\nQuery: revenue 2024"])[0]
    np.testing.assert_allclose(q, raw, atol=1e-5)


def test_embedder_appends_eos_and_truncates():
    from veritasfi_tpu.models.decoder_embedder import DecoderEmbedder

    emb = DecoderEmbedder(arch=QWEN_TINY, instruction=None, max_length=8)
    rows = emb._rows(["alpha beta gamma delta epsilon zeta eta theta iota"])
    assert len(rows[0]) <= 8
    # eos survives truncation (the pooled position must stay the summary
    # token, not an arbitrary mid-sentence token)
    assert rows[0][-1] == QWEN_TINY.eos_id
    short = emb._rows(["alpha"])
    assert short[0][-1] == QWEN_TINY.eos_id


# ---------------------------------------------------------------------------
# stack + generation integration
# ---------------------------------------------------------------------------
def test_build_reranker_from_qwen2_dir(tmp_path):
    """A local qwen2 checkpoint dir routes through decoder_arch_from_config
    + load_decoder_params (same branch as gemma)."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config, Qwen2ForCausalLM

    from veritasfi_tpu.config import Config
    from veritasfi_tpu.models.reranker import CrossEncoderReranker
    from veritasfi_tpu.stack import build_reranker

    cfg = Qwen2Config(
        vocab_size=512, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=64, max_position_embeddings=64,
        tie_word_embeddings=True)
    torch.manual_seed(0)
    model = Qwen2ForCausalLM(cfg).eval()
    model.save_pretrained(tmp_path)

    config = Config()
    config.rerank.model_name = str(tmp_path)
    rr = build_reranker(config)
    assert isinstance(rr, CrossEncoderReranker)
    assert rr.arch.attn_bias and rr.arch.mlp_act == "silu"
    scores = rr.compute_score([["q", "p"], ["q2", "p2"]])
    assert len(scores) == 2 and all(np.isfinite(scores))


def test_generator_with_qwen_arch():
    from veritasfi_tpu.models.generate import Generator

    module = FlaxDecoderLM(QWEN_TINY)
    params = _init(module)
    gen = Generator(module, params, max_prompt_len=16, max_new_tokens=8)
    out = gen.generate_tokens([[5, 9, 11]], max_new_tokens=6,
                              temperature=0.0)[0]
    out2 = gen.generate_tokens([[5, 9, 11]], max_new_tokens=6,
                               temperature=0.0)[0]
    assert out == out2 and 0 < len(out) <= 6


# ---------------------------------------------------------------------------
# judge embedder wiring
# ---------------------------------------------------------------------------
def test_build_judge_embed_fn_from_qwen3_dir(tmp_path):
    torch = pytest.importorskip("torch")
    from transformers import Qwen3Config, Qwen3ForCausalLM

    from veritasfi_tpu.evals.retrieval_eval import (build_judge_embed_fn,
                                                    judge_hits)

    cfg = Qwen3Config(
        vocab_size=512, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        intermediate_size=64, max_position_embeddings=64,
        tie_word_embeddings=True)
    torch.manual_seed(0)
    Qwen3ForCausalLM(cfg).eval().save_pretrained(tmp_path)

    embed = build_judge_embed_fn(str(tmp_path))
    out = np.asarray(embed(["revenue up", "deliveries down"]))
    assert out.shape == (2, 32)
    # identical evidence/chunk must judge as a cos-hit at threshold 0.9
    hits = judge_hits(["zeekr revenue grew"], ["zeekr revenue grew"],
                      embed, method="cos", sim_threshold=0.9)
    assert hits == [True]


def test_build_judge_embed_fn_preset_and_unknown():
    from veritasfi_tpu.evals.retrieval_eval import build_judge_embed_fn

    embed = build_judge_embed_fn("tiny-test")
    assert np.asarray(embed(["hello"])).shape[0] == 1
    with pytest.raises(ValueError):
        build_judge_embed_fn("no-such-model")
