"""Document → processed-JSON preprocessor.

The reference README advertises a multi-modal PDF preprocessing pipeline
(reference README.md:17-19) but does not ship it; its ingestion consumes
already-processed JSON (src/load_data.py:58-78). This module is that
missing front end: it converts extracted document text (plain text or
markdown; pages separated by form-feed ``\\f``) into the processed-PDF JSON
contract defined in ``ingest.contract`` —

* page-aware chunking with sentence packing to a target size,
* table detection (pipe/grid or aligned-column runs) rendered in the same
  ``[Table Level] / [Row Level]`` shape the HyDE prompt steers dense
  retrieval toward (serving/prompts.py::get_hypo_sys_prompt),
* figure detection (markdown images) emitted as ``modality="image"``
  chunks for the unified multi-modal index (BASELINE config #4),
* bundle grouping: a table/figure plus its surrounding context paragraph
  share a ``bundle_id``, so retrieval's whole-bundle gather
  (ensembleRetriever.py:78-83 semantics) returns them together,
* section-heading ``title_summary`` propagation, optionally refined by an
  injectable ``summarize_fn`` (an LLM call in production, a fake in tests).

Everything here is host-side text processing — the device never sees a
document until the bulk-embed ingest job.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

# --------------------------------------------------------------------------
# block model
# --------------------------------------------------------------------------

_HEADING_RE = re.compile(
    r"^(#{1,6}\s+\S.*"                      # markdown heading
    r"|item\s+\d+[a-z]?\.?\s+\S.*"          # 10-K "Item 7. ..." headings
    r"|part\s+[ivx]+\b.*)$",
    re.IGNORECASE)
_FIGURE_RE = re.compile(r"!\[(?P<caption>[^\]]*)\]\((?P<path>[^)]+)\)")
# digit-bounded so SEC accession-style digit runs (filing_0001065280) don't
# yield nonsense dates; month/day ranges validated
_DATE_IN_NAME_RE = re.compile(
    r"(?<!\d)(\d{4})[-_]?(0[1-9]|1[0-2])[-_]?(0[1-9]|[12]\d|3[01])(?!\d)")
_SENT_SPLIT_RE = re.compile(r"(?<=[.!?。！？])\s+")


def _is_heading(line: str) -> bool:
    s = line.strip()
    if not s or len(s) > 120:
        return False
    if _HEADING_RE.match(s):
        return True
    # short ALL-CAPS line with at least one letter and no sentence period
    letters = [c for c in s if c.isalpha()]
    return (bool(letters) and s.upper() == s and len(s.split()) <= 10
            and not s.endswith("."))


def _is_table_line(line: str) -> bool:
    s = line.rstrip()
    if not s.strip():
        return False
    if s.count("|") >= 2 or s.count("\t") >= 2:
        return True
    # aligned columns: 2+ runs of 2+ spaces between non-space fields
    if len(re.findall(r"\S {2,}(?=\S)", s)) >= 2:
        return True
    return False


@dataclass
class Block:
    kind: str                   # "heading" | "table" | "figure" | "para"
    text: str
    caption: str = ""           # figures: markdown alt text
    image_path: str = ""        # figures: target path
    rows: List[str] = field(default_factory=list)   # tables: raw lines


def parse_blocks(page_text: str) -> List[Block]:
    """Split one page's text into heading / table / figure / paragraph
    blocks. Tables are maximal runs of ≥2 consecutive table-shaped lines
    (a lone aligned line inside prose stays prose)."""
    blocks: List[Block] = []
    para_lines: List[str] = []
    table_lines: List[str] = []

    def flush_para():
        if para_lines:
            text = "\n".join(para_lines).strip()
            if text:
                blocks.append(Block("para", text))
            para_lines.clear()

    def flush_table():
        if len(table_lines) >= 2:
            blocks.append(Block("table", "\n".join(table_lines),
                                rows=list(table_lines)))
        elif table_lines:            # single aligned line: treat as prose
            para_lines.extend(table_lines)
        table_lines.clear()

    for raw in page_text.splitlines():
        line = raw.rstrip("\n")
        fig = _FIGURE_RE.search(line)
        if fig:
            flush_table()
            flush_para()
            blocks.append(Block("figure", line,
                                caption=fig.group("caption").strip(),
                                image_path=fig.group("path").strip()))
            # prose around an inline image stays in the corpus
            rest = _FIGURE_RE.sub("", line).strip()
            if rest:
                para_lines.append(rest)
            continue
        # markdown '#' headings win outright; otherwise a table-shaped line
        # (pipes / aligned columns) is a table row even when ALL-CAPS —
        # financial tables are full of 'TOTAL REVENUES  1,234  5,678' rows
        # that the caps-heading heuristic would otherwise split on
        explicit_heading = line.strip().startswith("#") and _is_heading(line)
        if not explicit_heading and _is_table_line(line):
            flush_para()
            table_lines.append(line.rstrip())
            continue
        if explicit_heading or _is_heading(line):
            flush_table()
            flush_para()
            blocks.append(Block("heading", line.strip().lstrip("#").strip()))
            continue
        if not line.strip():
            flush_table()
            flush_para()
            continue
        flush_table()
        para_lines.append(line.strip())
    flush_table()
    flush_para()
    return blocks


# --------------------------------------------------------------------------
# rendering
# --------------------------------------------------------------------------

def render_table(block: Block, title: str, context: str = "") -> str:
    """Render a detected table in the ``[Table Level] / [Row Level]`` shape
    the HyDE prompt generates, so table chunks and hypothetical table
    answers live near each other in embedding space."""
    header = block.rows[0].strip() if block.rows else ""
    body = [r for r in block.rows[1:]
            if set(r.strip()) - set("|-+= \t")]   # drop rule lines
    lines = ["[Table Level]",
             f"- Table Title: {title or 'Table'}",
             f"- Table Summary: {header}"]
    if context:
        lines.append(f"- Context: {context}")
    lines.append("")
    lines.append("[Row Level]")
    for i, row in enumerate(body, 1):
        cells = [c.strip() for c in re.split(r"\||\t| {2,}", row)
                 if c.strip()]
        lines.append(f"- Row {i}: " + "; ".join(cells))
    return "\n".join(lines)


def pack_sentences(text: str, target_chars: int) -> List[str]:
    """Pack sentences into chunks of at most ``target_chars`` (a sentence
    longer than the target becomes its own chunk; no mid-sentence cuts)."""
    sentences = [s.strip() for s in _SENT_SPLIT_RE.split(text) if s.strip()]
    chunks: List[str] = []
    cur: List[str] = []
    size = 0
    for s in sentences:
        if cur and size + len(s) + 1 > target_chars:
            chunks.append(" ".join(cur))
            cur, size = [], 0
        cur.append(s)
        size += len(s) + 1
    if cur:
        chunks.append(" ".join(cur))
    return chunks


# --------------------------------------------------------------------------
# document → contract rows
# --------------------------------------------------------------------------

def split_pages(text: str, fallback_chars: int = 3000) -> List[str]:
    """Pages split on form-feed; without one, approximate pages by packing
    paragraphs to ``fallback_chars`` (page numbers must exist for the
    contract's page-range filter)."""
    if "\f" in text:
        return [p for p in text.split("\f")]
    paras = re.split(r"\n\s*\n", text)
    pages: List[str] = []
    cur: List[str] = []
    size = 0
    for p in paras:
        if cur and size + len(p) > fallback_chars:
            pages.append("\n\n".join(cur))
            cur, size = [], 0
        cur.append(p)
        size += len(p)
    if cur:
        pages.append("\n\n".join(cur))
    return pages or [""]


def preprocess_document(
    text: str,
    date_published: str,
    *,
    doc_name: str = "doc",
    target_chars: int = 1200,
    summarize_fn: Optional[Callable[[str, str], str]] = None,
) -> List[Dict]:
    """Convert one document's extracted text into processed-JSON rows
    (header row first), ready for ``ingest.contract.load_processed_dir``.

    ``summarize_fn(section_title, section_text) -> str`` optionally refines
    each section's ``title_summary`` (LLM in production); by default the
    section heading itself is the title summary, which is what retrieval's
    title path matches on.
    """
    pages = split_pages(text)
    rows: List[Dict] = []
    bundle_n = 0
    section_title = ""
    section_first_par: Dict[str, str] = {}

    # pass 1: first paragraph per section (cheap summary material)
    cur = ""
    for page in pages:
        for b in parse_blocks(page):
            if b.kind == "heading":
                cur = b.text
            elif b.kind == "para" and cur and cur not in section_first_par:
                section_first_par[cur] = b.text

    summary_cache: Dict[str, str] = {}

    def title_summary() -> Optional[str]:
        if not section_title:
            return None
        if summarize_fn is not None:
            # one summarizer call per SECTION, not per chunk (the fn is an
            # LLM call in production)
            if section_title not in summary_cache:
                summary_cache[section_title] = summarize_fn(
                    section_title, section_first_par.get(section_title, ""))
            return summary_cache[section_title]
        return section_title

    for page_no, page in enumerate(pages, start=1):
        blocks = parse_blocks(page)
        last_para: Optional[Dict] = None
        for b in blocks:
            if b.kind == "heading":
                section_title = b.text
                last_para = None
                continue
            if b.kind == "para":
                for piece in pack_sentences(b.text, target_chars):
                    row = {"content": piece, "page_number": page_no,
                           "title_summary": title_summary()}
                    rows.append(row)
                    last_para = row
                continue
            # table / figure: bundle with the preceding context paragraph
            bundle_n += 1
            bundle_id = f"{doc_name}_b{bundle_n}"
            if last_para is not None and not last_para.get("bundle_id"):
                last_para["bundle_id"] = bundle_id
            if b.kind == "table":
                context = last_para["content"][:160] if last_para else ""
                content = render_table(b, section_title, context)
            else:
                content = (f"[Figure] {b.caption or 'Figure'} "
                           f"(image: {b.image_path})")
            row = {"content": content, "page_number": page_no,
                   "bundle_id": bundle_id,
                   "title_summary": title_summary()}
            if b.kind == "figure":
                row["modality"] = "image"
                row["image_path"] = b.image_path
            rows.append(row)

    header = {"start": 1, "end": len(pages),
              "date_published": date_published}
    # drop empty title_summary keys for contract-shaped rows
    clean = []
    for r in rows:
        if r.get("title_summary") is None:
            r.pop("title_summary", None)
        clean.append(r)
    return [header] + clean


def date_from_filename(filename: str, default: str = "1970-01-01") -> str:
    m = _DATE_IN_NAME_RE.search(os.path.basename(filename))
    if not m:
        return default
    y, mo, d = m.groups()
    return f"{y}-{mo}-{d}"


def preprocess_dir(
    src_dir: str,
    out_dir: str,
    *,
    target_chars: int = 1200,
    default_date: str = "1970-01-01",
    summarize_fn: Optional[Callable[[str, str], str]] = None,
) -> List[str]:
    """Preprocess every ``.txt`` / ``.md`` file in ``src_dir`` into
    processed-JSON files in ``out_dir`` (one output per input, named
    ``<stem>.json``). ``date_published`` is parsed from a ``YYYY-MM-DD`` /
    ``YYYYMMDD`` pattern in the filename, else ``default_date``.
    Returns the written paths (sorted input order, matching the
    deterministic ingest order of ``load_processed_dir``)."""
    os.makedirs(out_dir, exist_ok=True)
    written: List[str] = []
    used = set()
    for name in sorted(os.listdir(src_dir)):
        stem, ext = os.path.splitext(name)
        if ext.lower() not in (".txt", ".md", ".markdown"):
            continue
        with open(os.path.join(src_dir, name), encoding="utf-8") as f:
            text = f.read()
        rows = preprocess_document(
            text, date_from_filename(name, default_date), doc_name=stem,
            target_chars=target_chars, summarize_fn=summarize_fn)
        out_name = f"{stem}.json"
        if out_name in used:     # report.md + report.txt must not collide
            out_name = f"{stem}_{ext.lstrip('.')}.json"
        used.add(out_name)
        out_path = os.path.join(out_dir, out_name)
        with open(out_path, "w", encoding="utf-8") as f:
            json.dump(rows, f, ensure_ascii=False, indent=1)
        written.append(out_path)
    return written
