"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is tested on a virtual CPU mesh (the driver separately
dry-runs the multi-chip path); real-TPU benchmarking happens in bench.py.
Must run before jax is imported anywhere.
"""

import os

# Platform forcing (CPU, 8 virtual devices) happens in pytest_force_cpu.py,
# loaded via pytest.ini addopts BEFORE output capture starts.
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import json
import random

import jax
import numpy as np
import pytest

# XLA-CPU's oneDNN matmul path trades precision for speed (~1e-3 rel error),
# which breaks fp32 parity assertions; force true fp32 math in tests.
jax.config.update("jax_default_matmul_precision", "highest")
if jax.default_backend() == "cpu" and len(jax.devices()) < 8:
    # ensure the 8-device virtual CPU mesh even if XLA_FLAGS was ignored
    jax.config.update("jax_num_cpu_devices", 8)

from veritasfi_tpu.ingest.contract import load_processed_dir


def make_processed_file(path, date_published, chunks, start=1, end=10_000):
    """Write one processed-PDF JSON file per the ingestion contract."""
    rows = [{"start": start, "end": end, "date_published": date_published}]
    rows.extend(chunks)
    with open(path, "w", encoding="utf-8") as f:
        json.dump(rows, f, ensure_ascii=False)


def synth_chunk(i, page=1, bundle_id=None, title_summary=None, content=None):
    row = {
        "content": content if content is not None else f"chunk {i} text body about topic {i % 7}",
        "page_number": page,
    }
    if bundle_id is not None:
        row["bundle_id"] = bundle_id
    if title_summary is not None:
        row["title_summary"] = title_summary
    return row


@pytest.fixture
def synth_corpus_dir(tmp_path):
    """A 2-file synthetic corpus exercising bundles, titles, dedup, linking."""
    rng = random.Random(0)
    d = tmp_path / "corpus"
    d.mkdir()
    file_a = [
        synth_chunk(0, page=1, title_summary="Title A"),
        synth_chunk(1, page=2, bundle_id="tbl-1", title_summary="Title A"),
        synth_chunk(2, page=2, bundle_id="tbl-1"),
        synth_chunk(3, page=3),
        synth_chunk(4, page=99, content="out of range chunk"),
    ]
    file_b = [
        synth_chunk(10, page=1, title_summary="Title B"),
        # duplicate of file_a chunk 3 with a NEWER date -> replaces it
        synth_chunk(3, page=5),
        synth_chunk(12, page=6, bundle_id="fig-1"),
        synth_chunk(13, page=6, bundle_id="fig-1"),
    ]
    make_processed_file(d / "a.json", "2024-01-01", file_a, start=1, end=10)
    make_processed_file(d / "b.json", "2024-06-01", file_b, start=1, end=10)
    return str(d)


@pytest.fixture
def synth_records(synth_corpus_dir):
    return load_processed_dir(synth_corpus_dir, filenames=["a.json", "b.json"])
