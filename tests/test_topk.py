import jax.numpy as jnp
import numpy as np
import pytest

from veritasfi_tpu.ops.topk import dense_topk, dense_topk_chunked, rank_of, scores_at
from veritasfi_tpu.ops.similarity import cosine_similarity_matrix


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(1000, 32)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = rng.normal(size=(5, 32)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    return jnp.asarray(corpus), jnp.asarray(queries)


def np_topk(corpus, queries, k):
    scores = queries @ corpus.T
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(scores, idx, axis=1), idx


def test_dense_topk_matches_numpy(data):
    corpus, queries = data
    s, i = dense_topk(corpus, queries, 10)
    ns, ni = np_topk(np.asarray(corpus), np.asarray(queries), 10)
    np.testing.assert_array_equal(np.asarray(i), ni)
    np.testing.assert_allclose(np.asarray(s), ns, atol=1e-5)


def test_dense_topk_k_clamped(data):
    corpus, queries = data
    s, i = dense_topk(corpus[:4], queries, 10)
    assert s.shape == (5, 4)


def test_tie_break_prefers_lower_index():
    row = np.zeros((1, 8), np.float32)
    row[0, 0] = 1.0
    corpus = jnp.asarray(np.repeat(row, 6, axis=0))  # six identical vectors
    q = jnp.asarray(row)
    _, idx = dense_topk(corpus, q, 3)
    assert list(np.asarray(idx)[0]) == [0, 1, 2]


def test_chunked_matches_full(data):
    corpus, queries = data
    s1, i1 = dense_topk(corpus, queries, 17)
    s2, i2 = dense_topk_chunked(corpus, queries, 17, block=128)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)


def test_chunked_uneven_blocks(data):
    corpus, queries = data
    s2, i2 = dense_topk_chunked(corpus[:777], queries, 5, block=100)
    ns, ni = np_topk(np.asarray(corpus)[:777], np.asarray(queries), 5)
    np.testing.assert_array_equal(np.asarray(i2), ni)


def test_scores_at(data):
    corpus, queries = data
    idx = jnp.asarray(np.tile(np.arange(7), (5, 1)))
    s = scores_at(corpus, queries, idx)
    expected = np.asarray(queries) @ np.asarray(corpus)[:7].T
    np.testing.assert_allclose(np.asarray(s), expected, atol=1e-5)


def test_rank_of(data):
    corpus, queries = data
    # candidates: scores of the true top-3 rows per query, computed via
    # scores_at (the real usage path) -> ranks 0,1,2
    _, top_idx = dense_topk(corpus, queries, 3)
    top3 = scores_at(corpus, queries, top_idx)
    ranks = rank_of(corpus, queries, top3, block=128)
    np.testing.assert_array_equal(np.asarray(ranks), np.tile([0, 1, 2], (5, 1)))
    # a score below everything ranks N
    worst = jnp.full((5, 1), -2.0, jnp.float32)
    np.testing.assert_array_equal(np.asarray(rank_of(corpus, queries, worst)), 1000)


def test_cosine_similarity_matrix():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(6, 16)).astype(np.float32)
    sim = np.asarray(cosine_similarity_matrix(jnp.asarray(x)))
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    np.testing.assert_allclose(sim, xn @ xn.T, atol=1e-5)
    np.testing.assert_allclose(np.diag(sim), 1.0, atol=1e-5)


def test_chunked_topk_exact_order_at_large_indices():
    """A global index*1e-12 bias reorders genuinely different scores once
    indices are large (1.5e-7 at row 150k vs one f32 ulp of 6e-8 at score
    0.9). The chunked kernel must rank by TRUE score at any index."""
    import numpy as np

    from veritasfi_tpu.ops.topk import dense_topk_chunked

    n, d = 200_000, 2
    corpus = np.zeros((n, d), np.float32)
    corpus[:, 1] = 1.0                       # orthogonal to the query
    hi, lo = 150_000, 10
    corpus[hi] = [0.9, 0.0]
    corpus[lo] = [np.float32(0.9) - np.float32(1e-7), 0.0]
    q = np.asarray([[1.0, 0.0]], np.float32)
    s, i = dense_topk_chunked(jnp.asarray(corpus), jnp.asarray(q), 2,
                              block=65536)
    assert i[0, 0] == hi and i[0, 1] == lo, np.asarray(i)
    assert float(s[0, 0]) > float(s[0, 1])


def test_chunked_topk_exact_ties_prefer_lower_index():
    import numpy as np

    from veritasfi_tpu.ops.topk import dense_topk_chunked

    n = 140_000
    corpus = np.zeros((n, 2), np.float32)
    corpus[:, 1] = 1.0
    for row in (70_001, 120_000, 5):
        corpus[row] = [0.8, 0.0]             # exact three-way tie
    q = np.asarray([[1.0, 0.0]], np.float32)
    _, i = dense_topk_chunked(jnp.asarray(corpus), jnp.asarray(q), 3,
                              block=65536)
    assert list(np.asarray(i[0])) == [5, 70_001, 120_000]
