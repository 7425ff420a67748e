"""Dynamic int8 matmul (interpret mode on CPU) vs f32 reference."""

import numpy as np

import jax.numpy as jnp

from veritasfi_tpu.ops.int8_matmul import dynamic_int8_matmul

import pytest

# slow tier: excluded from the default run (pytest.ini -m 'not slow');
# the full matrix runs with `pytest -m ""`
pytestmark = pytest.mark.slow


def test_dynamic_int8_matmul_accuracy():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(40, 128)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(128, 256)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.normal(size=(256,)), jnp.float32)
    out = dynamic_int8_matmul(a, w, bias=b, interpret=True)
    ref = a @ w + b
    # dynamic per-row/per-col int8: ~1% relative error budget
    err = np.abs(np.asarray(out) - np.asarray(ref))
    scale = np.abs(np.asarray(ref)).mean()
    assert err.mean() < 0.02 * scale + 0.02
    assert out.shape == (40, 256)


def test_prequant_matches_dynamic():
    from veritasfi_tpu.ops.int8_matmul import (prequant_int8_matmul,
                                               quantize_weight)

    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.normal(size=(24, 128)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(128, 256)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(256,)), jnp.float32)
    w8, sw = quantize_weight(w)
    out_pre = prequant_int8_matmul(a, w8, sw, bias=b, interpret=True)
    out_dyn = dynamic_int8_matmul(a, w, bias=b, interpret=True)
    np.testing.assert_allclose(np.asarray(out_pre), np.asarray(out_dyn),
                               rtol=1e-5, atol=1e-5)


def test_fused_int8_mlp_matches_unfused():
    """The single-kernel MLP == prequant GEMM -> gelu -> prequant GEMM."""
    import jax

    from veritasfi_tpu.ops.int8_matmul import (fused_int8_mlp,
                                               prequant_int8_matmul,
                                               quantize_weight)

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(20, 64)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(64, 192)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(192,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(192, 64)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(64,)) * 0.1, jnp.float32)
    w1q, s1 = quantize_weight(w1)
    w2q, s2 = quantize_weight(w2)
    fused = fused_int8_mlp(x, w1q, s1, b1, w2q, s2, b2, gelu_tanh=True,
                           interpret=True)
    h = prequant_int8_matmul(x, w1q, s1, bias=b1, interpret=True)
    g = jax.nn.gelu(h, approximate=True)
    unfused = prequant_int8_matmul(g, w2q, s2, bias=b2, interpret=True)
    # identical GEMMs; the only delta is the extra dynamic quantization of
    # g between the two GEMMs in the fused kernel
    err = np.abs(np.asarray(fused) - np.asarray(unfused))
    scale = np.abs(np.asarray(unfused)).mean()
    assert err.mean() < 0.02 * scale + 0.02
    assert fused.shape == (20, 64)


def test_fused_int8_mlp_erf_gelu():
    from veritasfi_tpu.ops.int8_matmul import fused_int8_mlp, quantize_weight

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(4, 128)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(128, 128)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(128, 128)) * 0.1, jnp.float32)
    zeros = jnp.zeros((128,), jnp.float32)
    w1q, s1 = quantize_weight(w1)
    w2q, s2 = quantize_weight(w2)
    out_t = fused_int8_mlp(x, w1q, s1, zeros, w2q, s2, zeros,
                           gelu_tanh=True, interpret=True)
    out_e = fused_int8_mlp(x, w1q, s1, zeros, w2q, s2, zeros,
                           gelu_tanh=False, interpret=True)
    # tanh-approx vs erf gelu differ by <=1e-3 per activation pre-GEMM2
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_e),
                               rtol=0.05, atol=0.05)


def test_int8_mlp_layer_close_to_xla():
    import dataclasses

    from veritasfi_tpu.models.encoder import ENCODER_PRESETS
    from veritasfi_tpu.models.encoder_reranker import (
        FlaxCrossEncoderClassifier)

    rng = np.random.default_rng(1)
    base = ENCODER_PRESETS["tiny-test"]
    ids = jnp.asarray(rng.integers(3, 900, size=(4, 32)), jnp.int32)
    mask = jnp.ones((4, 32), jnp.int32)
    m_xla = FlaxCrossEncoderClassifier(base, dtype=jnp.float32)
    params = m_xla.init(__import__("jax").random.PRNGKey(0), ids,
                        jnp.ones_like(ids))
    out_xla = m_xla.apply(params, ids, mask)
    from veritasfi_tpu.models.encoder import quantize_mlp_params

    m_int8 = FlaxCrossEncoderClassifier(
        dataclasses.replace(base, mlp_impl="int8"), dtype=jnp.float32)
    out_int8 = m_int8.apply(quantize_mlp_params(params), ids, mask)
    np.testing.assert_allclose(np.asarray(out_int8), np.asarray(out_xla),
                               rtol=0.15, atol=0.15)


def test_quantize_mlp_params_frozen_dict():
    """flax FrozenDict param trees must quantize identically to plain
    dicts (the kernel gate matched Mapping for the walk but dict for the
    rewrite, silently skipping frozen trees)."""
    import dataclasses

    import flax
    import jax

    from veritasfi_tpu.models.encoder import (ENCODER_PRESETS,
                                              quantize_mlp_params)
    from veritasfi_tpu.models.encoder_reranker import (
        FlaxCrossEncoderClassifier)

    rng = np.random.default_rng(2)
    base = ENCODER_PRESETS["tiny-test"]
    ids = jnp.asarray(rng.integers(3, 900, size=(2, 16)), jnp.int32)
    mask = jnp.ones((2, 16), jnp.int32)
    m = FlaxCrossEncoderClassifier(base, dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(0), ids, mask)
    q_plain = quantize_mlp_params(params)
    q_frozen = quantize_mlp_params(flax.core.freeze(params))
    flat_p = jax.tree_util.tree_leaves_with_path(q_plain)
    flat_f = jax.tree_util.tree_leaves_with_path(q_frozen)
    assert len(flat_p) == len(flat_f)
    for (kp, vp), (kf, vf) in zip(flat_p, flat_f):
        assert jax.tree_util.keystr(kp) == jax.tree_util.keystr(kf)
        np.testing.assert_array_equal(np.asarray(vp), np.asarray(vf))
    m_int8 = FlaxCrossEncoderClassifier(
        dataclasses.replace(base, mlp_impl="int8"), dtype=jnp.float32)
    out_f = m_int8.apply(q_frozen, ids, mask)
    out_p = m_int8.apply(q_plain, ids, mask)
    np.testing.assert_array_equal(np.asarray(out_f), np.asarray(out_p))
