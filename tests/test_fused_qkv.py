"""qkv_impl='fused' (one [hidden, 3*hidden] attention projection GEMM)
must reproduce the split-QKV forward exactly — it is a serving-perf layout
change, not a numerics change."""

import numpy as np

from veritasfi_tpu.models.encoder import TextEncoder
from veritasfi_tpu.models.encoder_reranker import EncoderReranker


def test_text_encoder_fuse_qkv_exact():
    enc = TextEncoder(preset="tiny-test", seed=3)
    texts = ["revenue grew strongly", "table of quarterly figures",
             "short"]
    before = enc.encode(texts)
    enc.fuse_qkv()
    assert enc.arch.qkv_impl == "fused"
    after = enc.encode(texts)
    np.testing.assert_allclose(before, after, rtol=1e-6, atol=1e-6)
    # idempotent
    enc.fuse_qkv()
    np.testing.assert_allclose(enc.encode(texts), after, rtol=1e-6,
                               atol=1e-6)


def test_reranker_fuse_qkv_exact():
    rr = EncoderReranker(preset="tiny-test", seed=5)
    pairs = [["what was revenue?", "revenue was 4.2 billion in the quarter"],
             ["delivery guidance?", "deliveries rose 12 percent"]]
    before = rr.compute_score(pairs)
    rr.fuse_qkv()
    after = rr.compute_score(pairs)
    np.testing.assert_allclose(before, after, rtol=1e-6, atol=1e-6)


def test_fuse_qkv_param_layout():
    from veritasfi_tpu.models.encoder import fuse_qkv_params

    enc = TextEncoder(preset="tiny-test", seed=7)
    fused = fuse_qkv_params(enc.params)
    attn = fused["params"]["layer_0"]["attention"]
    assert "qkv" in attn and "query" not in attn
    h = enc.arch.hidden
    assert attn["qkv"]["kernel"].shape == (h, 3 * h)
    assert attn["qkv"]["bias"].shape == (3 * h,)
    # order is (q, k, v)
    orig = enc.params["params"]["layer_0"]["attention"]
    np.testing.assert_array_equal(
        np.asarray(attn["qkv"]["kernel"][:, :h]),
        np.asarray(orig["query"]["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(attn["qkv"]["kernel"][:, 2 * h:]),
        np.asarray(orig["value"]["kernel"]))
