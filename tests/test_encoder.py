import jax.numpy as jnp
import numpy as np
import pytest

from veritasfi_tpu.models.encoder import ENCODER_PRESETS, EncoderArch, TextEncoder
from veritasfi_tpu.models.hash_embedder import HashEmbedder
from veritasfi_tpu.models.tokenizer import HashTokenizer, basic_tokens

# slow tier: excluded from the default run (pytest.ini -m 'not slow');
# the full matrix runs with `pytest -m ""`
pytestmark = pytest.mark.slow


def test_hash_tokenizer_deterministic():
    tok = HashTokenizer(1024)
    a = tok(["Zeekr revenue grew", "Zeekr revenue grew"], 32)
    assert np.array_equal(a["input_ids"][0], a["input_ids"][1])
    assert a["input_ids"][0][0] == tok.cls_id


def test_basic_tokens_cjk():
    assert basic_tokens("极氪 Q3 营收!") == ["极", "氪", "q3", "营", "收", "!"]


@pytest.fixture(scope="module")
def enc():
    return TextEncoder(preset="tiny-test", seed=0)


def test_encode_shape_and_norm(enc):
    out = enc.encode(["hello world", "zeekr revenue in 2024"])
    assert out.shape == (2, 64)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)


def test_encode_empty(enc):
    assert enc.encode([]).shape == (0, 64)


def test_padding_invariance(enc):
    """Same text must embed identically regardless of batch companions
    (mask correctness + length bucketing)."""
    alone = enc.encode(["short text"])[0]
    with_long = enc.encode(["short text", "a much longer text " * 20])[0]
    np.testing.assert_allclose(alone, with_long, atol=2e-5)


def test_embed_query_alias(enc):
    v = enc.embed_query("hello")
    assert isinstance(v, list) and len(v) == 64


def test_mean_pooling():
    arch = EncoderArch(vocab_size=1024, hidden=64, layers=1, heads=2,
                       intermediate=128, max_positions=128, pooling="mean")
    enc = TextEncoder(arch=arch)
    out = enc.encode(["hello world"])
    assert out.shape == (1, 64)


def test_roberta_position_offset():
    arch = ENCODER_PRESETS["tiny-test"]
    arch = EncoderArch(**{**arch.__dict__, "pos_offset": 2, "pad_id": 1})
    enc = TextEncoder(arch=arch)
    out = enc.encode(["hello", "hello world longer"])
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)


def test_hash_embedder_similarity():
    emb = HashEmbedder(dim=128)
    vecs = emb.encode([
        "Zeekr quarterly revenue grew strongly",
        "Zeekr revenue grew in the quarter",
        "the weather in Paris is rainy",
    ])
    sim = vecs @ vecs.T
    assert sim[0, 1] > sim[0, 2]
    np.testing.assert_allclose(np.diag(sim), 1.0, atol=1e-6)


@pytest.mark.slow
def test_parity_with_hf_bert():
    """FlaxEncoder must reproduce a real HF BertModel forward (weight
    conversion + architecture correctness)."""
    torch = pytest.importorskip("torch")
    from transformers import BertConfig, BertModel

    from veritasfi_tpu.models.hf_loader import load_bert_params

    cfg = BertConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=48,
        max_position_embeddings=24, hidden_act="gelu",
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = BertModel(cfg).eval()

    arch = EncoderArch(vocab_size=64, hidden=32, layers=2, heads=4,
                       intermediate=48, max_positions=24)
    params = load_bert_params(model.state_dict(), arch)

    ids = np.array([[2, 5, 9, 11, 0, 0], [3, 7, 13, 17, 19, 23]], np.int32)
    mask = np.array([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]], np.int32)

    with torch.no_grad():
        hf_out = model(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        ).last_hidden_state.numpy()
    hf_cls = hf_out[:, 0]
    hf_cls = hf_cls / np.linalg.norm(hf_cls, axis=1, keepdims=True)

    from veritasfi_tpu.models.encoder import FlaxEncoder

    flax_out = FlaxEncoder(arch).apply(params, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(flax_out), hf_cls, atol=2e-4)
