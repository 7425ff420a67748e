"""Ingestion contract semantics (golden tests on the data model,
matching reference load_data.py:23-130 behavior)."""

import pytest

from veritasfi_tpu.ingest.contract import hash_content, load_processed_dir


def test_page_range_filter(synth_records):
    records, _ = synth_records
    contents = [r.content for r in records]
    assert "out of range chunk" not in contents


def test_dedup_keeps_newest(synth_records):
    records, _ = synth_records
    dup = [r for r in records if r.content == "chunk 3 text body about topic 3"]
    assert len(dup) == 1
    # b.json (2024-06-01) is newer than a.json (2024-01-01)
    assert dup[0].filename == "b.json"
    assert dup[0].date_published == "2024-06-01"
    # replacement keeps first-occurrence position: the duplicate still sits
    # between a.json chunks in the deduped order
    idx = [r.content for r in records].index("chunk 3 text body about topic 3")
    assert idx == 3


def test_global_ids_assigned_pre_dedup(synth_records):
    records, _ = synth_records
    # 4 in-range chunks in a.json (gid 0..3), 4 in b.json (gid 4..7).
    # The duplicate in b.json replaced the a.json entry, carrying gid 5.
    gids = {r.content: r.global_id for r in records}
    assert gids["chunk 0 text body about topic 0"] == 0
    assert gids["chunk 3 text body about topic 3"] == 5  # replaced entry's gid
    assert gids["chunk 10 text body about topic 3"] == 4


def test_prev_next_linking_same_file_only(synth_records):
    records, _ = synth_records
    by_content = {r.content: r for r in records}
    c0 = by_content["chunk 0 text body about topic 0"]
    c1 = by_content["chunk 1 text body about topic 1"]
    assert c0.prev_chunk_id == ""
    assert c0.next_chunk_id == c1.doc_id
    assert c1.prev_chunk_id == c0.doc_id
    # boundary between a.json block and the replaced b.json chunk: the
    # replaced record's filename is b.json, so it does NOT link to the
    # preceding a.json chunk
    c2 = by_content["chunk 2 text body about topic 2"]
    dup = by_content["chunk 3 text body about topic 3"]
    assert c2.next_chunk_id == ""
    assert dup.prev_chunk_id == ""


def test_title_summaries_sorted_unique(synth_records):
    _, titles = synth_records
    assert titles == ["Title A", "Title B"]


def test_doc_id_is_sha256(synth_records):
    records, _ = synth_records
    for r in records:
        assert r.doc_id == hash_content(r.content)


def test_header_validation(tmp_path):
    p = tmp_path / "bad.json"
    p.write_text('[{"start": 1}]')
    with pytest.raises(ValueError, match="header row missing"):
        load_processed_dir(str(tmp_path), filenames=["bad.json"])


def test_figure_rows_with_same_content_not_deduped(tmp_path):
    """Identical placeholder content but different image_path must stay
    distinct records (content-only dedup dropped one image)."""
    import json

    from veritasfi_tpu.ingest.contract import load_processed_dir

    rows = [{"start": 1, "end": 5, "date_published": "2024-01-01"},
            {"content": "[Figure]", "page_number": 1,
             "modality": "image", "image_path": "a.png"},
            {"content": "[Figure]", "page_number": 2,
             "modality": "image", "image_path": "b.png"}]
    d = tmp_path / "p"
    d.mkdir()
    (d / "f.json").write_text(json.dumps(rows))
    records, _ = load_processed_dir(str(d))
    assert len(records) == 2
    assert {r.image_path for r in records} == {"a.png", "b.png"}


def test_missing_page_number_defaults_to_range_start(tmp_path):
    import json

    from veritasfi_tpu.ingest.contract import load_processed_dir

    rows = [{"start": 3, "end": 9, "date_published": "2024-01-01"},
            {"content": "no page field here"}]
    d = tmp_path / "p2"
    d.mkdir()
    (d / "f.json").write_text(json.dumps(rows))
    records, _ = load_processed_dir(str(d))
    assert len(records) == 1 and records[0].page_number == 3


def test_load_collection_python_bm25_fallback(tmp_path):
    """native_bm25=False (or the C++ engine unbuilt) must load the
    persisted Python BM25 index — the reverse-lookup fallback crashed with
    KeyError because the collection wasn't registered yet."""
    import json

    from veritasfi_tpu.config import Config
    from veritasfi_tpu.engine import RAGEngine

    src = tmp_path / "src"
    src.mkdir()
    rows = [{"start": 1, "end": 9, "date_published": "2024-01-01"}]
    for i in range(8):
        rows.append({"content": f"chunk {i} revenue tok{i}",
                     "page_number": i + 1})
    (src / "a.json").write_text(json.dumps(rows))

    cfg = Config(persist_directory=str(tmp_path / "idx"))
    cfg.encoder.model_name = "nonexistent-model"     # hash embedder
    cfg.retrieval.native_bm25 = False
    eng = RAGEngine(cfg)
    eng.create_collection("c", str(src))

    eng2 = RAGEngine(cfg)                            # fresh session
    eng2.load_collection("c")
    r = eng2.create_retriever(3, "c")
    chunks = r.invoke("revenue tok2", [])
    assert chunks and any(c["retriever"] == "BM25" for c in chunks)


def test_register_collection_clears_stale_bm25(tmp_path):
    import numpy as np

    from veritasfi_tpu.config import Config
    from veritasfi_tpu.engine import RAGEngine
    from veritasfi_tpu.ingest.contract import ChunkRecord, hash_content
    from veritasfi_tpu.ingest.corpus import build_corpus_index
    from veritasfi_tpu.retrieval.bm25 import BM25Index

    def make(n, tag):
        recs = []
        for i in range(n):
            content = f"{tag} chunk {i} revenue"
            recs.append(ChunkRecord(
                content=content, filename="f.json", page_number=i + 1,
                date_published="2024-01-01", doc_id=hash_content(content),
                global_id=i))
        return build_corpus_index(recs, [], embed_fn=None)

    cfg = Config()
    cfg.encoder.model_name = "nonexistent-model"
    eng = RAGEngine(cfg)
    a = make(6, "alpha")
    eng.register_collection("x", a, BM25Index.build(a.texts, a.doc_ids))
    b = make(3, "beta")
    eng.register_collection("x", b)          # no bm25 -> stale one cleared
    assert eng.get_bm25("x") is None if hasattr(eng, "get_bm25") else True
    assert "x" not in eng._bm25
