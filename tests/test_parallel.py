"""Mesh construction + distributed top-k parity on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from veritasfi_tpu.ops.topk import dense_topk
from veritasfi_tpu.parallel import distributed_topk, make_mesh, shard_corpus


def test_make_mesh_shapes():
    mesh = make_mesh([("corpus", 8)])
    assert mesh.shape == {"corpus": 8}
    mesh2 = make_mesh([("data", 4), ("model", -1)])
    assert mesh2.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh([("corpus", 3)])


@pytest.fixture(scope="module")
def sharded():
    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(1000, 64)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = rng.normal(size=(4, 64)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    mesh = make_mesh([("corpus", 8)])
    arr, n = shard_corpus(corpus, mesh)
    return corpus, queries, mesh, arr, n


def test_shard_corpus_pads(sharded):
    corpus, _, mesh, arr, n = sharded
    assert n == 1000
    assert arr.shape[0] == 1000  # already divisible by 8
    mesh2 = make_mesh([("corpus", 8)])
    arr2, n2 = shard_corpus(corpus[:999], mesh2)
    assert n2 == 999 and arr2.shape[0] % 8 == 0


def test_distributed_matches_single_device(sharded):
    corpus, queries, mesh, arr, n = sharded
    s1, i1 = dense_topk(jnp.asarray(corpus), jnp.asarray(queries), 37)
    s2, i2 = distributed_topk(arr, jnp.asarray(queries), 37, mesh, n)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)


def test_distributed_with_padding(sharded):
    corpus, queries, mesh, _, _ = sharded
    trimmed = corpus[:995]  # forces 5 zero pad rows
    arr, n = shard_corpus(trimmed, mesh)
    s1, i1 = dense_topk(jnp.asarray(trimmed), jnp.asarray(queries), 20)
    s2, i2 = distributed_topk(arr, jnp.asarray(queries), 20, mesh, n)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    assert np.asarray(i2).max() < 995  # pad rows never surface


def test_distributed_tie_break_exact():
    """Identical vectors across different shards must merge in ascending
    index order, bit-identical to single-device."""
    row = np.zeros((1, 64), np.float32)
    row[0, 0] = 1.0
    corpus = np.repeat(row, 16, axis=0)  # 2 identical rows per shard
    mesh = make_mesh([("corpus", 8)])
    arr, n = shard_corpus(corpus, mesh)
    q = jnp.asarray(row)
    _, idx = distributed_topk(arr, q, 10, mesh, n)
    assert list(np.asarray(idx)[0]) == list(range(10))


def test_k_larger_than_shard():
    """k may exceed per-shard row count."""
    rng = np.random.default_rng(1)
    corpus = rng.normal(size=(64, 32)).astype(np.float32)
    queries = rng.normal(size=(2, 32)).astype(np.float32)
    mesh = make_mesh([("corpus", 8)])
    arr, n = shard_corpus(corpus, mesh)
    s1, i1 = dense_topk(jnp.asarray(corpus), jnp.asarray(queries), 20)
    s2, i2 = distributed_topk(arr, jnp.asarray(queries), 20, mesh, n)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
