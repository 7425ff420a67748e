"""Native C++ BM25 vs the Python implementation: identical semantics."""

import numpy as np
import pytest

from veritasfi_tpu.retrieval.bm25 import BM25Index, tokenize
from veritasfi_tpu.retrieval.stemmer import porter_stem

native = pytest.importorskip("veritasfi_tpu.native.bm25_native")
if not native.native_available():
    pytest.skip("no C++ toolchain", allow_module_level=True)

CORPUS = [
    "Zeekr reported quarterly revenue growth across premium segments",
    "Delivery volumes increased in Europe while margins improved",
    "The cats running quickly through relational databases",
    "Battery costs declined; vehicle deliveries grew in China",
    "General conditional considerations for operational adjustments",
    "revenue revenue revenue margin margin growth",
]


@pytest.fixture(scope="module")
def pair():
    py = BM25Index.build(CORPUS)
    cc = native.NativeBM25(CORPUS)
    return py, cc


@pytest.mark.parametrize("query", [
    "quarterly revenue growth",
    "deliveries in europe and china",
    "cats running databases",
    "margin improvement conditional",
    "completely unrelated zebra query",
    "",
])
def test_scores_match_python(pair, query):
    py, cc = pair
    np.testing.assert_allclose(cc.get_scores(query), py.get_scores(query),
                               rtol=1e-5, atol=1e-6)


def test_topk_matches_python(pair):
    py, cc = pair
    for query in ["revenue growth", "vehicle deliveries china"]:
        pi, ps = py.invoke(query, 4)
        ci, cs = cc.invoke(query, 4)
        np.testing.assert_array_equal(pi, ci)
        np.testing.assert_allclose(ps, cs, rtol=1e-5, atol=1e-6)


def test_topk_k_clamped(pair):
    _, cc = pair
    ids, scores = cc.invoke("revenue", 100)
    assert len(ids) == len(CORPUS)


def test_stemmer_alignment():
    """The C++ stemmer must agree with the Python one on the corpus+query
    vocabulary (checked indirectly via identical scores above); spot-check
    classic Porter examples through the Python reference."""
    for word, stem in [("caresses", "caress"), ("ponies", "poni"),
                       ("relational", "relat"), ("conditional", "condit"),
                       ("running", "run"), ("quickly", "quickli"),
                       ("adjustment", "adjust"), ("databases", "databas")]:
        assert porter_stem(word) == stem


def test_native_refuses_non_ascii_corpus():
    import pytest as _pytest

    from veritasfi_tpu.native.bm25_native import NativeBM25, native_available

    if not native_available():
        _pytest.skip("native lib unavailable")
    with _pytest.raises(ValueError):
        NativeBM25(["Société Générale revenue", "plain ascii doc"])


# ---------------------------------------------------------------------------
# Pre-tokenized build path (vfi_bm25_build_tokens): shares the query-time
# code with the text build exactly; here we pin that a token-id build over
# the tokenize()d corpus scores identically to the text build / Python engine.
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def token_built():
    vocab = {}
    indptr = [0]
    tokens = []
    for doc in CORPUS:
        for t in tokenize(doc):
            tokens.append(vocab.setdefault(t, len(vocab)))
        indptr.append(len(tokens))
    idx = native.NativeBM25.from_token_ids(
        np.asarray(indptr, np.int64), np.asarray(tokens, np.int32),
        vocab_size=len(vocab))
    return idx, vocab


@pytest.mark.parametrize("query", [
    "quarterly revenue growth",
    "deliveries in europe and china",
    "margin improvement conditional",
    "completely unrelated zebra query",
])
def test_token_build_scores_match_python(pair, token_built, query):
    py, _ = pair
    idx, vocab = token_built
    qids = [vocab.get(t, -1) for t in tokenize(query)]
    np.testing.assert_allclose(idx.get_scores_ids(qids), py.get_scores(query),
                               rtol=1e-5, atol=1e-6)


def test_token_build_topk_matches_python(pair, token_built):
    py, _ = pair
    idx, vocab = token_built
    for query in ["revenue growth", "vehicle deliveries china",
                  "no such terms anywhere"]:
        qids = [vocab.get(t, -1) for t in tokenize(query)]
        pi, ps = py.invoke(query, 4)
        ci, cs = idx.invoke_ids(qids, 4)
        np.testing.assert_array_equal(pi, ci)
        np.testing.assert_allclose(ps, cs, rtol=1e-5, atol=1e-6)


def test_token_build_zero_pad_ordering(token_built):
    """Fewer positive docs than k: the tail must be zero-score docs in
    ascending id order (the Python engine's full lexsort contract)."""
    idx, vocab = token_built
    qids = [vocab.get("zeekr", -1)]      # matches only doc 0
    ids, scores = idx.invoke_ids(qids, 5)
    assert ids[0] == 0 and scores[0] > 0
    assert list(ids[1:]) == [1, 2, 3, 4]
    assert (scores[1:] == 0).all()


def test_token_build_random_parity_vs_scipy():
    """Randomized 2k-doc corpus: token-id build == scipy engine built from
    the same token lists (duplicate terms, skewed dfs, repeated queries —
    exercises the sparse-candidate accumulate/reset scratch reuse)."""
    rng = np.random.default_rng(7)
    vocab_size = 300
    words = [f"w{i}" for i in range(vocab_size)]
    lens = rng.integers(3, 40, size=2000)
    docs_ids, indptr, tokens = [], [0], []
    for n in lens:
        ids = (rng.zipf(1.4, size=n) - 1) % vocab_size
        docs_ids.append(ids)
        tokens.extend(int(i) for i in ids)
        indptr.append(len(tokens))
    texts = [" ".join(words[i] for i in ids) for ids in docs_ids]
    py = BM25Index.build(texts)
    idx = native.NativeBM25.from_token_ids(
        np.asarray(indptr, np.int64), np.asarray(tokens, np.int32),
        vocab_size=vocab_size)
    # map py vocab: tokenize("wN") stems are stable for wN (no suffix rules)
    for _ in range(8):
        q_ids = (rng.zipf(1.4, size=6) - 1) % vocab_size
        q_text = " ".join(words[i] for i in q_ids)
        py_cols = [py.vocab.get(t, -1) for t in tokenize(q_text)]
        assert all(c >= 0 or words[i] not in py.vocab
                   for c, i in zip(py_cols, q_ids))
        pi, ps = py.invoke(q_text, 25)
        ci, cs = idx.invoke_ids(np.asarray(q_ids, np.int32), 25)
        np.testing.assert_array_equal(pi, ci)
        np.testing.assert_allclose(ps, cs, rtol=1e-5, atol=1e-6)


def test_concurrent_queries_one_handle(pair):
    """ctypes calls release the GIL, and the C++ query path reuses
    per-handle scratch buffers — without the per-handle query lock,
    concurrent server threads corrupt results PERMANENTLY (the scratch's
    all-zero-between-calls invariant breaks). 8 threads hammering one
    handle must each see exactly the single-threaded answers, and the
    handle must still score correctly afterwards."""
    from concurrent.futures import ThreadPoolExecutor

    _, cc = pair
    queries = ["quarterly revenue growth", "deliveries in europe and china",
               "margin improvement conditional", "revenue margin growth"]
    expect = {q: cc.invoke(q, 4) for q in queries}

    def worker(seed):
        rng = np.random.default_rng(seed)
        bad = 0
        for _ in range(150):
            q = queries[int(rng.integers(len(queries)))]
            ids, scores = cc.invoke(q, 4)
            ei, es = expect[q]
            if not (np.array_equal(ids, ei)
                    and np.allclose(scores, es, rtol=1e-5, atol=1e-6)):
                bad += 1
        return bad

    with ThreadPoolExecutor(8) as ex:
        assert sum(ex.map(worker, range(8))) == 0
    # the handle survives: post-concurrency single-thread results intact
    for q in queries:
        ids, scores = cc.invoke(q, 4)
        np.testing.assert_array_equal(ids, expect[q][0])
        np.testing.assert_allclose(scores, expect[q][1],
                                   rtol=1e-5, atol=1e-6)
