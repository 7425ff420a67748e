"""CorpusIndex array/CSR construction, metadata parity, persistence."""

import numpy as np

from veritasfi_tpu.ingest.contract import load_processed_dir
from veritasfi_tpu.ingest.corpus import CorpusIndex, build_corpus_index, date_to_days


def fake_embed(texts):
    """Deterministic per-text embedding for tests."""
    out = np.zeros((len(texts), 16), dtype=np.float32)
    for i, t in enumerate(texts):
        rng = np.random.default_rng(abs(hash(t)) % (2**32))
        out[i] = rng.normal(size=16)
    return out


def build(synth_corpus_dir):
    records, titles = load_processed_dir(
        synth_corpus_dir, filenames=["a.json", "b.json"]
    )
    return records, build_corpus_index(records, titles, embed_fn=fake_embed)


def test_bundle_csr(synth_corpus_dir):
    records, idx = build(synth_corpus_dir)
    assert set(idx.bundle_names) == {"tbl-1", "fig-1"}
    code = idx.bundle_names.index("tbl-1")
    rows = idx.bundle_rows(code)
    assert [idx.texts[r] for r in rows] == [
        "chunk 1 text body about topic 1",
        "chunk 2 text body about topic 2",
    ]
    # rows are ascending (matches the reference's linear-scan order,
    # ensembleRetriever.py:81)
    assert list(rows) == sorted(rows)


def test_title_csr(synth_corpus_dir):
    _, idx = build(synth_corpus_dir)
    code = idx.title_texts.index("Title A")
    rows = idx.title_rows(code)
    assert len(rows) == 2
    assert all(idx.title_code[r] == code for r in rows)


def test_metadata_reference_shape(synth_corpus_dir):
    records, idx = build(synth_corpus_dir)
    for i, rec in enumerate(records):
        assert idx.metadata(i) == rec.metadata()


def test_embeddings_normalized(synth_corpus_dir):
    _, idx = build(synth_corpus_dir)
    norms = np.linalg.norm(idx.embeddings, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    assert idx.ts_embeddings.shape[0] == 2


def test_date_days(synth_corpus_dir):
    _, idx = build(synth_corpus_dir)
    assert date_to_days("1970-01-02") == 1
    assert idx.date_days[0] == date_to_days("2024-01-01")


def test_save_load_roundtrip(synth_corpus_dir, tmp_path):
    _, idx = build(synth_corpus_dir)
    d = str(tmp_path / "index")
    idx.save(d)
    loaded = CorpusIndex.load(d)
    assert loaded.texts == idx.texts
    assert loaded.doc_ids == idx.doc_ids
    np.testing.assert_array_equal(loaded.bundle_code, idx.bundle_code)
    np.testing.assert_array_equal(loaded.bundle_members, idx.bundle_members)
    np.testing.assert_allclose(loaded.embeddings, idx.embeddings)
    for i in range(loaded.num_chunks):
        assert loaded.metadata(i) == idx.metadata(i)


def test_doc_index(synth_corpus_dir):
    _, idx = build(synth_corpus_dir)
    for d, i in idx.doc_index().items():
        assert idx.doc_ids[i] == d
