"""Mixed-modality index: figure chunks embedded by the vision encoder into
the unified corpus matrix (BASELINE config #4)."""

import json

import numpy as np
import pytest

from veritasfi_tpu.ingest.contract import load_processed_dir
from veritasfi_tpu.ingest.corpus import build_corpus_index
from veritasfi_tpu.models.hash_embedder import HashEmbedder
from veritasfi_tpu.models.image_encoder import ImageEncoder, VIT_PRESETS


@pytest.fixture(scope="module")
def image_encoder():
    return ImageEncoder(preset="tiny-test")


def test_vit_shapes_and_norm(image_encoder):
    rng = np.random.default_rng(0)
    imgs = [rng.random((32, 32, 3)).astype(np.float32) for _ in range(3)]
    out = image_encoder.encode(imgs)
    assert out.shape == (3, 64)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)


def test_vit_deterministic(image_encoder):
    img = np.random.default_rng(1).random((32, 32, 3)).astype(np.float32)
    a = image_encoder.encode([img])
    b = image_encoder.encode([img, img])
    np.testing.assert_allclose(a[0], b[0], atol=1e-5)
    np.testing.assert_allclose(b[0], b[1], atol=1e-6)


def test_preprocess_path_and_pil(image_encoder, tmp_path):
    from PIL import Image

    img = Image.fromarray(
        (np.random.default_rng(2).random((48, 48, 3)) * 255).astype("uint8"))
    p = str(tmp_path / "fig.png")
    img.save(p)
    out = image_encoder.encode([p])
    assert out.shape == (1, 64)


def test_mixed_modality_index(tmp_path, image_encoder):
    """Figure chunks with image_path get vision embeddings; text chunks get
    text embeddings; one unified matrix serves mixed top-k."""
    rng = np.random.default_rng(3)
    fig_path = str(tmp_path / "chart.npy_img.png")
    from PIL import Image

    Image.fromarray((rng.random((32, 32, 3)) * 255).astype("uint8")).save(
        fig_path)

    rows = [{"start": 1, "end": 99, "date_published": "2024-01-01"},
            {"content": "Zeekr revenue grew in the quarter",
             "page_number": 1},
            {"content": "figure: revenue chart", "page_number": 2,
             "modality": "figure", "image_path": fig_path,
             "bundle_id": "fig-1"},
            {"content": "caption text for the revenue chart",
             "page_number": 2, "bundle_id": "fig-1"}]
    (tmp_path / "doc.json").write_text(json.dumps(rows))
    records, titles = load_processed_dir(str(tmp_path),
                                         filenames=["doc.json"])
    text_emb = HashEmbedder(dim=64)
    idx = build_corpus_index(records, titles, embed_fn=text_emb.encode,
                             image_embed_fn=image_encoder.encode)
    assert idx.embeddings.shape == (3, 64)
    assert idx.modalities == ["text", "figure", "text"]
    # the figure row's embedding differs from its text hash embedding
    text_only = text_emb.encode(["figure: revenue chart"])[0]
    assert not np.allclose(idx.embeddings[1], text_only, atol=1e-3)
    np.testing.assert_allclose(np.linalg.norm(idx.embeddings, axis=1), 1.0,
                               atol=1e-5)


def test_dim_mismatch_raises(tmp_path):
    rows = [{"start": 1, "end": 9, "date_published": "2024-01-01"},
            {"content": "fig", "page_number": 1, "modality": "figure",
             "image_path": "x.png"}]
    (tmp_path / "d.json").write_text(json.dumps(rows))
    records, titles = load_processed_dir(str(tmp_path), filenames=["d.json"])
    bad_image_fn = lambda paths: np.ones((len(paths), 32), np.float32)
    with pytest.raises(ValueError, match="dim"):
        build_corpus_index(records, titles,
                           embed_fn=HashEmbedder(dim=64).encode,
                           image_embed_fn=bad_image_fn)


def test_uint8_array_input_scaled():
    """A uint8 numpy image must be scaled to [0,1] like the PIL path."""
    import numpy as np

    from veritasfi_tpu.models.image_encoder import ImageEncoder

    enc = ImageEncoder(preset="tiny-test")
    size = enc.arch.image_size
    arr8 = np.full((size, size, 3), 255, np.uint8)
    arrf = np.ones((size, size, 3), np.float32)
    a = enc.encode([arr8])
    b = enc.encode([arrf])
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        enc.preprocess(np.zeros((size, size), np.uint8))   # grayscale
