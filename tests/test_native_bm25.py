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
