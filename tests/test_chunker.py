"""Document preprocessor: raw text/markdown -> processed-JSON contract.

The output must round-trip through ingest.contract.load_processed_dir and
carry the structures retrieval depends on: bundles grouping tables/figures
with their context paragraph, section-heading title summaries, page-aware
chunking, and [Table Level]/[Row Level] table rendering (the HyDE table
shape, serving/prompts.py::get_hypo_sys_prompt)."""

import json
import os

from veritasfi_tpu.ingest.chunker import (date_from_filename, pack_sentences,
                                          parse_blocks, preprocess_dir,
                                          preprocess_document, render_table,
                                          split_pages)
from veritasfi_tpu.ingest.contract import load_processed_dir

DOC = """# Item 7. Management Discussion

Revenue grew 32% year over year driven by premium segment deliveries. \
Gross margin improved to 18.2% on battery cost declines.

Quarterly deliveries by region are shown below.

Region   | Q1    | Q2
China    | 24100 | 28400
Europe   | 9100  | 12800

![Delivery trend chart](figures/deliveries.png)
\f
# Liquidity and Capital Resources

Cash flow from operations was positive for the third consecutive quarter. \
Capital expenditure guidance is unchanged at 1.2 billion.
"""


def test_blocks_detect_heading_table_figure():
    kinds = [b.kind for b in parse_blocks(DOC.split("\f")[0])]
    assert kinds == ["heading", "para", "para", "table", "figure"]


def test_single_aligned_line_stays_prose():
    blocks = parse_blocks("plain sentence here.\ncols  a  b\nmore prose.")
    assert all(b.kind == "para" for b in blocks)
    assert "cols  a  b" in " ".join(b.text for b in blocks)


def test_pack_sentences_respects_target():
    text = " ".join(f"Sentence number {i} is right here." for i in range(20))
    chunks = pack_sentences(text, target_chars=80)
    assert all(len(c) <= 80 for c in chunks)
    assert " ".join(chunks) == text


def test_split_pages_formfeed_and_fallback():
    assert len(split_pages(DOC)) == 2
    nofeed = "\n\n".join(f"para {i} " + "x" * 400 for i in range(10))
    pages = split_pages(nofeed, fallback_chars=1000)
    assert len(pages) > 1


def test_table_render_shape():
    blocks = [b for b in parse_blocks(DOC.split("\f")[0])
              if b.kind == "table"]
    text = render_table(blocks[0], "Deliveries", "context sentence")
    assert text.startswith("[Table Level]")
    assert "- Table Title: Deliveries" in text
    assert "[Row Level]" in text
    assert "- Row 1: China; 24100; 28400" in text


def test_document_rows_contract(tmp_path):
    rows = preprocess_document(DOC, "2024-05-01", doc_name="10k",
                               target_chars=300)
    header = rows[0]
    assert header == {"start": 1, "end": 2, "date_published": "2024-05-01"}
    chunks = rows[1:]
    # table and figure each bundled; table shares bundle with context para
    table = next(r for r in chunks if r["content"].startswith("[Table"))
    figure = next(r for r in chunks if r.get("modality") == "image")
    context = next(r for r in chunks
                   if r.get("bundle_id") == table["bundle_id"]
                   and r is not table)
    assert "deliveries by region" in context["content"].lower()
    assert figure["image_path"] == "figures/deliveries.png"
    assert figure["bundle_id"] != table["bundle_id"]
    # section headings propagate; page numbers follow the form feed
    assert table["title_summary"] == "Item 7. Management Discussion"
    page2 = [r for r in chunks if r["page_number"] == 2]
    assert page2 and all(
        r["title_summary"] == "Liquidity and Capital Resources"
        for r in page2)

    # round-trip through the ingestion contract
    d = tmp_path / "processed"
    d.mkdir()
    (d / "10k.json").write_text(json.dumps(rows))
    records, titles = load_processed_dir(str(d))
    assert len(records) == len(chunks)
    assert "Item 7. Management Discussion" in titles
    by_bundle = [r for r in records if r.bundle_id == table["bundle_id"]]
    assert len(by_bundle) == 2


def test_summarize_fn_injectable():
    rows = preprocess_document(
        DOC, "2024-05-01",
        summarize_fn=lambda title, first: f"{title} :: {first[:20]}")
    titled = [r for r in rows[1:] if r.get("title_summary")]
    assert titled and all(" :: " in r["title_summary"] for r in titled)


def test_preprocess_dir_end_to_end(tmp_path):
    src = tmp_path / "raw"
    out = tmp_path / "processed"
    src.mkdir()
    (src / "report_2024-05-01.md").write_text(DOC)
    (src / "ignore.pdf").write_text("binary-ish")
    written = preprocess_dir(str(src), str(out))
    assert [os.path.basename(p) for p in written] == [
        "report_2024-05-01.json"]
    records, _ = load_processed_dir(str(out))
    assert records and records[0].date_published == "2024-05-01"


def test_date_from_filename():
    assert date_from_filename("a_2023-11-05.md") == "2023-11-05"
    assert date_from_filename("b_20231105.txt") == "2023-11-05"
    assert date_from_filename("nodate.txt", "2020-01-01") == "2020-01-01"


def test_caps_table_row_is_not_a_heading():
    text = ("Revenue summary follows.\n\n"
            "Segment   | FY23    | FY24\n"
            "TOTAL REVENUES  1,234  5,678\n"
            "NET INCOME  111  222\n")
    blocks = parse_blocks(text)
    kinds = [b.kind for b in blocks]
    assert "table" in kinds and "heading" not in kinds
    table = next(b for b in blocks if b.kind == "table")
    assert len(table.rows) == 3


def test_inline_figure_keeps_surrounding_prose():
    text = "As shown in ![chart](fig1.png), gross margin rose 5 points."
    blocks = parse_blocks(text)
    assert [b.kind for b in blocks] == ["figure", "para"]
    assert "gross margin rose 5 points" in blocks[1].text


def test_preprocess_dir_stem_collision(tmp_path):
    src = tmp_path / "raw"
    out = tmp_path / "processed"
    src.mkdir()
    (src / "report.md").write_text("# A\n\nMarkdown body text here.")
    (src / "report.txt").write_text("Plain body text here.")
    written = preprocess_dir(str(src), str(out), default_date="2024-01-01")
    assert len(written) == len(set(written)) == 2
    records, _ = load_processed_dir(str(out))
    joined = " ".join(r.content for r in records)
    assert "Markdown body" in joined and "Plain body" in joined


def test_date_from_filename_rejects_digit_runs():
    assert date_from_filename("filing_0001065280.txt",
                              "2020-01-01") == "2020-01-01"
    assert date_from_filename("x_2023-13-05.md", "2020-01-01") == "2020-01-01"


def test_summarize_fn_called_once_per_section():
    calls = []

    def summarize(title, first):
        calls.append(title)
        return f"S:{title}"

    text = ("# Alpha\n\nOne. Two. Three. Four. Five. Six.\n\n"
            "Seven. Eight. Nine. Ten.\n\n# Beta\n\nEleven. Twelve.")
    rows = preprocess_document(text, "2024-01-01", target_chars=30,
                               summarize_fn=summarize)
    assert len([r for r in rows[1:] if r.get("title_summary")]) >= 4
    assert sorted(set(calls)) == ["Alpha", "Beta"]
    assert len(calls) == 2


def test_cli_global_options_after_subcommand(tmp_path):
    """The docstring examples put --config after the subcommand; both
    orders must parse."""
    import veritasfi_tpu.cli as cli

    cfg = tmp_path / "c.yaml"
    cfg.write_text("persist_directory: " + str(tmp_path / "idx") + "\n")
    src = tmp_path / "raw"
    src.mkdir()
    (src / "a_2024-01-02.md").write_text("# T\n\nBody sentence one.")
    rc = cli.main(["preprocess", "--config", str(cfg),
                   "--source-dir", str(src),
                   "--out-dir", str(tmp_path / "out1")])
    assert rc == 0
    rc = cli.main(["--config", str(cfg), "preprocess",
                   "--source-dir", str(src),
                   "--out-dir", str(tmp_path / "out2")])
    assert rc == 0
