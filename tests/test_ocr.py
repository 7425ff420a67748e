"""Scanned-page OCR front (ingest/ocr.py).

Closes the reference README's advertised-but-unshipped PDF pipeline gap
(/root/reference/README.md:17-19): page image -> text -> processed-JSON.
The recognizer is trained in-repo on a reduced charset here to keep the
suite fast; the full-charset accuracy numbers live in the module docstring
and OCR_r03.json.
"""
import difflib
import json

import numpy as np
import pytest

from veritasfi_tpu.ingest.ocr import (OCRModel, _crop_glyph, ocr_page,
                                      ocr_pages_to_processed, render_page,
                                      segment_glyphs, segment_lines,
                                      train_ocr)

# slow tier: excluded from the default run (pytest.ini -m 'not slow');
# the full matrix runs with `pytest -m ""`
pytestmark = pytest.mark.slow

# letters chosen to spell the fixture sentences; digits for the weld
# tokens ("N," etc.) the thousands-separator tests need
TINY = "0123456789,.$abcdeinrst"


@pytest.fixture(scope="module")
def model():
    return train_ocr(charset=TINY, steps=260, batch=128,
                     font_sizes=(14, 16), seed=0)


def _acc(ref: str, out: str) -> float:
    return difflib.SequenceMatcher(
        None, ref.replace("\n", ""), out.replace("\n", "")).ratio()


# -- segmentation (no model needed) ------------------------------------
def test_segment_lines_counts():
    img = render_page("abc\ndef\n123", font_size=16)
    assert len(segment_lines(img)) == 3
    blank = np.full((64, 64), 255, np.uint8)
    assert segment_lines(blank) == []


def test_segment_glyphs_boxes_and_word_gap():
    img = render_page("abc de", font_size=16)
    (y0, y1), = segment_lines(img)
    boxes = segment_glyphs(img[y0:y1])
    assert len(boxes) == 5
    gaps = [boxes[i][0] - boxes[i - 1][1] for i in range(1, 5)]
    assert max(gaps) == gaps[2]   # the word space is the widest gap


def test_multipart_glyphs_merge_to_one_box():
    # i-dot, colon pieces and '=' bars x-overlap their partner and must
    # read as ONE glyph box each
    for ch in "i:=":
        img = render_page(f"a {ch} a", font_size=18)
        (y0, y1), = segment_lines(img)
        assert len(segment_glyphs(img[y0:y1])) == 3, ch


def test_crop_glyph_normalization():
    img = render_page("a", font_size=16)
    (y0, y1), = segment_lines(img)
    (x0, x1, _), = segment_glyphs(img[y0:y1])
    crop = _crop_glyph(img[y0:y1], x0, x1)
    assert crop.shape == (24, 16)
    assert crop.min() >= 0.0 and crop.max() <= 1.0
    assert crop.max() > 0.5   # ink present


def test_empty_page_ocr(model):
    assert ocr_page(model, np.full((64, 64), 255, np.uint8)) == ""


# -- recognition -------------------------------------------------------
PAGE = "\n".join([
    "net assets increased 18.3",
    "interest stand at $4,211 said",
    "trade debt decreased since 2024.",
])


def test_roundtrip_clean(model):
    out = ocr_page(model, render_page(PAGE, font_size=16))
    assert _acc(PAGE, out) >= 0.97, out


def test_roundtrip_noisy(model):
    out = ocr_page(model, render_page(PAGE, font_size=16,
                                      noise=0.05, seed=11))
    assert _acc(PAGE, out) >= 0.93, out


def test_weld_thousands_separator(model):
    # ',' welds under (or kerns tightly against) the preceding digit;
    # whether the weld class or the split-glyph path handles it, the
    # number must reassemble with no inserted space — ','/'.' identity
    # is the tiny fixture model's hardest pair, so either is accepted
    import re

    out = ocr_page(model, render_page("interest stand at $4,211 said",
                                      font_size=16))
    assert re.search(r"4[.,]211", out), out


def test_font_size_generalization(model):
    out = ocr_page(model, render_page("net assets increased", font_size=14))
    assert _acc("net assets increased", out) >= 0.9, out


def test_multi_font_training_covers_both_families():
    """One classifier trained across two font families must round-trip
    pages rendered in EITHER (the r3 artifact's single-font scope gap);
    rotation jitter on training crops must not break convergence."""
    from veritasfi_tpu.ingest.ocr import available_fonts

    fonts = available_fonts()
    assert "default" in fonts
    if "dejavu-serif" not in fonts:
        pytest.skip("DejaVu Serif not on this host")
    m = train_ocr(charset="0123456789,.$abcdeinrst", steps=260, batch=128,
                  font_sizes=(14, 16), seed=0,
                  fonts=("default", "dejavu-serif"), rotate_deg=1.5)
    ref = "net assets increased 18.3"
    for fam in ("default", "dejavu-serif"):
        out = ocr_page(m, render_page(ref, font_size=16, font_family=fam))
        assert _acc(ref, out) >= 0.9, (fam, out)


# -- persistence -------------------------------------------------------
def test_save_load_roundtrip(model, tmp_path):
    path = str(tmp_path / "ocr_model")
    model.save(path)
    loaded = OCRModel.load(path)
    assert loaded.tokens == model.tokens
    img = render_page(PAGE, font_size=16)
    assert ocr_page(loaded, img) == ocr_page(model, img)


# -- processed-JSON integration ---------------------------------------
def test_pages_to_processed_contract(model, tmp_path):
    pages = [render_page("net assets increased 18.3", font_size=16),
             render_page("trade debt decreased since 2024.", font_size=16)]
    out_path = str(tmp_path / "doc.json")
    rows = ocr_pages_to_processed(model, pages, "2024-03-01",
                                  doc_name="scan", out_path=out_path)
    header, chunks = rows[0], rows[1:]
    assert header["date_published"] == "2024-03-01"
    assert header["start"] == 1 and header["end"] >= 2
    assert chunks and all("content" in c and "page_number" in c
                          for c in chunks)
    # round-trips through the ingestion contract file format
    with open(out_path) as f:
        assert json.load(f) == rows


# -- segmentation regressions (round-4 TTF fixes) ----------------------
def test_ink_threshold_includes_argmax_bin():
    """Otsu class 0 is bins 0..k INCLUSIVE: stroke gray sitting in the
    argmax bin above its center (TTF renders: gray 11 vs bin-2 center
    9.96) must still read as ink — it used to vanish, blanking whole
    glyph crops at train AND inference time."""
    from veritasfi_tpu.ingest.ocr import _ink

    strip = np.full((15, 2), 255.0, np.float32)
    strip[3:9, 0] = 11.0     # stroke core
    strip[3:9, 1] = 131.0    # antialias edge
    mask = _ink(strip)
    assert mask[:, 0].sum() == 6, mask.sum()


def test_spaces_bimodal_gap_clustering():
    """Proportional TTF gap geometry: letter gaps 2-3 px vs a 7 px word
    gap on a 12 px line. The old median+0.05h threshold (2.6) read every
    3 px letter gap as a space; the Otsu gap split must flag ONLY the
    word gap."""
    from veritasfi_tpu.ingest.ocr import _spaces

    xs, boxes = 0, []
    for gap, w in [(0, 8), (3, 2), (2, 8), (3, 8), (2, 8), (7, 8),
                   (3, 8), (2, 8), (3, 2), (2, 8)]:
        xs += gap
        boxes.append((xs, xs + w))
        xs += w
    chars = list("quarterly!"[: len(boxes)])
    sps = _spaces(boxes, chars, height=12)
    assert sps == [False] * 5 + [True] + [False] * 4, sps
