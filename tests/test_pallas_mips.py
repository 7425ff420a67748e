"""Fused Pallas MIPS kernel vs the XLA baseline.

On CPU the kernel runs in interpreter mode (Mosaic compiles only on TPU);
the real-chip compile + bit-parity run is exercised by bench.py and was
validated on the v5e (idx equal, score maxdiff ~1e-8, FAISS tie order).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from veritasfi_tpu.ops import pallas_mips
from veritasfi_tpu.ops.topk import dense_topk


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    if jax.default_backend() != "tpu":
        from jax.experimental import pallas as pl

        orig = pl.pallas_call
        monkeypatch.setattr(pl, "pallas_call",
                            functools.partial(orig, interpret=True))
        # rebuild the jitted wrapper against the patched pallas_call
        monkeypatch.setattr(
            pallas_mips, "pallas_mips_topk",
            jax.jit(pallas_mips.pallas_mips_topk.__wrapped__,
                    static_argnames=("k", "block")))
    yield


def run(corpus, q, k, block=256):
    return pallas_mips.pallas_mips_topk(jnp.asarray(corpus), jnp.asarray(q),
                                        k, block=block)


@pytest.mark.parametrize("n,k", [(1000, 16), (777, 8), (100, 32)])
def test_matches_dense_topk(n, k):
    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(n, 128)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    q = rng.normal(size=(3, 128)).astype(np.float32)
    s1, i1 = dense_topk(jnp.asarray(corpus), jnp.asarray(q), k)
    s2, i2 = run(corpus, q, k)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)


def test_tie_order_ascending_index():
    row = np.zeros((1, 128), np.float32)
    row[0, 0] = 1.0
    corpus = np.repeat(row, 600, axis=0)
    _, idx = run(corpus, row, 8)
    assert list(np.asarray(idx)[0]) == list(range(8))


def test_k_exceeds_corpus():
    rng = np.random.default_rng(1)
    corpus = rng.normal(size=(10, 64)).astype(np.float32)
    q = rng.normal(size=(1, 64)).astype(np.float32)
    s, i = run(corpus, q, 32, block=256)
    assert s.shape == (1, 10)
