"""short_seq_mha (Pallas, interpret mode on CPU) vs the XLA reference."""

import numpy as np

import jax.numpy as jnp

from veritasfi_tpu.ops.pallas_attention import mha_reference, short_seq_mha


def test_short_seq_mha_matches_reference():
    rng = np.random.default_rng(0)
    b, h, s, d = 3, 2, 64, 32
    q = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    lengths = jnp.asarray([64, 40, 1], jnp.int32)
    out = short_seq_mha(q, k, v, lengths, interpret=True)
    ref = mha_reference(q, k, v, lengths)
    # compare only valid QUERY positions (padded-query rows are don't-care
    # in both paths, but -1e30 vs finfo.min differ there)
    for i, ln in enumerate([64, 40, 1]):
        np.testing.assert_allclose(np.asarray(out)[i, :, :ln],
                                   np.asarray(ref)[i, :, :ln],
                                   rtol=2e-5, atol=2e-5)


def test_encoder_pallas_attn_matches_xla_interpret():
    """FlaxCrossEncoderClassifier with attn_impl=pallas (interpret) equals
    the xla implementation on prefix masks."""
    import dataclasses

    from veritasfi_tpu.models.encoder import ENCODER_PRESETS
    from veritasfi_tpu.models.encoder_reranker import (
        FlaxCrossEncoderClassifier)

    rng = np.random.default_rng(1)
    base = ENCODER_PRESETS["tiny-test"]
    ids = jnp.asarray(rng.integers(3, 900, size=(4, 32)), jnp.int32)
    mask = np.ones((4, 32), np.int32)
    mask[1, 20:] = 0
    mask[2, 5:] = 0
    mask = jnp.asarray(mask)

    m_xla = FlaxCrossEncoderClassifier(base, dtype=jnp.float32)
    params = m_xla.init(__import__("jax").random.PRNGKey(0), ids,
                        jnp.ones_like(ids))
    out_xla = m_xla.apply(params, ids, mask)
    m_pl = FlaxCrossEncoderClassifier(
        dataclasses.replace(base, attn_impl="pallas"), dtype=jnp.float32)
    out_pl = m_pl.apply(params, ids, mask)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_xla),
                               rtol=1e-4, atol=1e-4)
