import numpy as np

from veritasfi_tpu.models.hash_embedder import HashEmbedder
from veritasfi_tpu.retrieval.dense import DenseRetriever


def test_invoke_reference_api():
    emb = HashEmbedder(dim=64)
    corpus_texts = [
        "Zeekr revenue was 300M in Q3 2024",
        "Lotus opened stores in Europe",
        "Zeekr delivered 50000 vehicles",
        "the cat sat on the mat",
    ]
    r = DenseRetriever(emb.encode(corpus_texts), emb.encode)
    idx, scores = r.invoke(["Zeekr Q3 revenue", "cats on mats"], k=2)
    assert idx.shape == (2, 2) and scores.shape == (2, 2)
    assert idx[0, 0] == 0            # revenue chunk tops revenue query
    assert idx[1, 0] == 3            # cat chunk tops cat query
    assert scores[0, 0] >= scores[0, 1]  # descending


def test_search_array_api():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    mat = rng.normal(size=(50, 16)).astype(np.float32)
    r = DenseRetriever(mat, None)
    q = mat[:3] / np.linalg.norm(mat[:3], axis=1, keepdims=True)
    scores, idx = r.search(jnp.asarray(q), k=1)
    assert list(np.asarray(idx)[:, 0]) == [0, 1, 2]
    np.testing.assert_allclose(np.asarray(scores)[:, 0], 1.0, atol=1e-3)
