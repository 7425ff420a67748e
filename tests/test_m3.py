"""M3 multi-head encoder + candidate-stage fusion tests.

The reference's embedder is BGE-M3 but it uses only the dense head
(config/example.yaml:3, src/utils/faissRetriever.py:33); the sparse and
ColBERT heads here are a beyond-reference capability, so these tests pin
the heads' invariants, the scoring math against numpy oracles, and the
end-to-end claim that candidate-stage fusion actually ranks.
"""

import numpy as np
import pytest

from veritasfi_tpu.models.m3_heads import (M3Encoder, dedup_sparse_by_id,
                                           load_m3_head_params)

# slow tier: excluded from the default run (pytest.ini -m 'not slow');
# the full matrix runs with `pytest -m ""`
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def enc():
    return M3Encoder(preset="tiny-test", max_length=64, seed=0)


TEXTS = ["quarterly revenue grew twelve percent",
         "deliveries and margin guidance improved",
         "cash flow from operations was strong"]


# -- head invariants ----------------------------------------------------
def test_head_shapes_and_norms(enc):
    e = enc.encode_multi(TEXTS)
    B, L = e.ids.shape
    assert e.dense.shape == (B, enc.dim)
    assert e.sparse.shape == (B, L)
    assert e.colbert.shape == (B, L, enc.arch.colbert_dim)
    np.testing.assert_allclose(np.linalg.norm(e.dense, axis=1), 1.0,
                               atol=1e-5)
    # colbert rows are unit where the attention mask is on, zero where off
    norms = np.linalg.norm(e.colbert, axis=-1)
    np.testing.assert_allclose(norms[e.mask], 1.0, atol=1e-5)
    np.testing.assert_allclose(norms[~e.mask], 0.0, atol=1e-7)


def test_sparse_zero_on_pad_and_specials(enc):
    e = enc.encode_multi(TEXTS)
    assert (e.sparse >= 0).all()
    # pad positions carry no weight
    assert np.all(e.sparse[~e.mask] == 0.0)
    # CLS/SEP ids carry no weight even though attention attends to them
    for sid in enc.special_ids:
        assert np.all(e.sparse[e.ids == sid] == 0.0)
    # real word tokens do carry weight after any training signal exists —
    # at init relu may zero some, so only check the mask bookkeeping
    assert e.token_mask.sum() < e.mask.sum()


def test_dense_view_matches_multi(enc):
    e = enc.encode_multi(TEXTS)
    np.testing.assert_allclose(enc.encode(TEXTS), e.dense, atol=1e-6)


def test_dedup_sparse_by_id():
    ids = np.array([[7, 9, 7, 7, 0]], np.int32)
    w = np.array([[0.2, 0.5, 0.9, 0.1, 0.3]], np.float32)
    tok = np.array([[True, True, True, True, False]])
    out = dedup_sparse_by_id(ids, w, tok)
    # id 7: max(0.2, 0.9, 0.1) kept at FIRST occurrence only
    np.testing.assert_allclose(out[0], [0.9, 0.5, 0.0, 0.0, 0.3])


# -- scoring math vs numpy oracles --------------------------------------
def _np_sparse(q_ids, q_w, q_tok, d_ids, d_w, d_tok):
    s = 0.0
    for i in range(len(q_ids)):
        if not q_tok[i] or q_w[i] == 0:
            continue
        match = [d_w[j] for j in range(len(d_ids))
                 if d_tok[j] and d_ids[j] == q_ids[i]]
        if match:
            s += q_w[i] * max(match)
    return s


def _np_colbert(q_col, q_valid, d_col, d_mask):
    sims = []
    for i in range(q_col.shape[0]):
        if not q_valid[i]:
            continue
        best = max(float(q_col[i] @ d_col[j]) for j in
                   range(d_col.shape[0]) if d_mask[j])
        sims.append(best)
    return float(np.mean(sims)) if sims else 0.0


def test_scorer_components_match_numpy(enc):
    from veritasfi_tpu.retrieval.m3_scorer import M3CandidateScorer

    corpus = TEXTS + ["battery cost declines drove gross margin",
                      "store expansion across european markets"]
    scorer = M3CandidateScorer(enc, corpus, doc_max_length=32,
                               store_dtype="float32")
    query = "how did quarterly revenue grow"
    rows = [0, 2, 4]
    comp = scorer.score_rows(query, rows, components=True)

    q = enc.encode_multi([query], dedup_query_ids=True)
    d = enc.encode_multi(corpus)
    L = min(d.ids.shape[1], 32)
    for k, r in enumerate(rows):
        assert comp["dense"][k] == pytest.approx(
            float(q.dense[0] @ d.dense[r]), abs=1e-4)
        assert comp["sparse"][k] == pytest.approx(
            _np_sparse(q.ids[0], q.sparse[0], q.token_mask[0],
                       d.ids[r][:L], d.sparse[r][:L], d.token_mask[r][:L]),
            abs=1e-4)
        assert comp["colbert"][k] == pytest.approx(
            _np_colbert(q.colbert[0], q.mask[0],
                        d.colbert[r][:L], d.mask[r][:L]), abs=1e-4)
        w = np.asarray(scorer.weights)
        assert comp["fused"][k] == pytest.approx(
            w[0] * comp["dense"][k] + w[1] * comp["sparse"][k]
            + w[2] * comp["colbert"][k], abs=1e-4)


def test_trainer_matrices_match_scorer_oracles(enc):
    from veritasfi_tpu.train.m3 import (colbert_score_matrix,
                                        sparse_score_matrix)
    import jax.numpy as jnp

    e = enc.encode_multi(TEXTS)
    s_sp = np.asarray(sparse_score_matrix(
        jnp.asarray(e.ids), jnp.asarray(e.sparse),
        jnp.asarray(e.token_mask), jnp.asarray(e.ids),
        jnp.asarray(e.sparse), jnp.asarray(e.token_mask)))
    s_cb = np.asarray(colbert_score_matrix(
        jnp.asarray(e.colbert), jnp.asarray(e.mask),
        jnp.asarray(e.colbert), jnp.asarray(e.mask)))
    for i in range(len(TEXTS)):
        for j in range(len(TEXTS)):
            assert s_sp[i, j] == pytest.approx(_np_sparse(
                e.ids[i], e.sparse[i], e.token_mask[i],
                e.ids[j], e.sparse[j], e.token_mask[j]), abs=1e-4)
            assert s_cb[i, j] == pytest.approx(_np_colbert(
                e.colbert[i], e.mask[i], e.colbert[j], e.mask[j]),
                abs=1e-4)


def test_padded_candidate_slots_never_surface(enc):
    from veritasfi_tpu.retrieval.m3_scorer import M3CandidateScorer

    scorer = M3CandidateScorer(enc, TEXTS, doc_max_length=32)
    # 3 rows pad to a 16-bucket; only 3 scores come back
    out = scorer.score_rows("revenue", [0, 1, 2])
    assert out.shape == (3,)
    assert scorer.score_rows("revenue", []).shape == (0,)


# -- end-to-end: trained heads actually rank ----------------------------
def test_trained_fusion_ranks_positives_first():
    from veritasfi_tpu.retrieval.m3_scorer import M3CandidateScorer
    from veritasfi_tpu.train.m3 import M3ContrastiveTrainer

    rng = np.random.default_rng(0)
    topics = ["revenue", "margin", "deliveries", "battery",
              "capex", "guidance", "stores", "cash"]
    pairs, corpus = [], []
    for i, t in enumerate(topics):
        v = int(rng.integers(10, 99))
        doc = f"report section {i}: the {t} was {v} million in 2024"
        pairs.append((f"what was the {t} in 2024", doc))
        corpus.append(doc)
    vocab = [f"w{j}" for j in range(40)]
    for i in range(24):
        corpus.append("note " + " ".join(rng.choice(vocab, size=10)))

    enc = M3Encoder(preset="tiny-test", max_length=64, seed=1)
    tr = M3ContrastiveTrainer(enc, total_steps=80)
    losses = tr.fit(pairs, steps=80, batch_size=8, seed=0)
    assert losses[-1] < losses[0]

    scorer = M3CandidateScorer(enc, corpus, doc_max_length=64)
    hits = 0
    for i, (q, _) in enumerate(pairs):
        scores = scorer.score_rows(q, list(range(len(corpus))))
        hits += int(np.argmax(scores) == i)
    assert hits >= 6, f"trained M3 fusion recall@1 {hits}/8"


def test_rerank_chunks_reorders_and_annotates(enc):
    from veritasfi_tpu.retrieval.m3_scorer import M3CandidateScorer

    scorer = M3CandidateScorer(enc, TEXTS, doc_max_length=32)
    chunks = [{"_row": i, "page_content": TEXTS[i]} for i in range(3)]
    out = scorer.rerank_chunks("quarterly revenue grew", chunks)
    assert {c["_row"] for c in out} == {0, 1, 2}
    assert all("m3_score" in c for c in out)
    scores = [c["m3_score"] for c in out]
    assert scores == sorted(scores, reverse=True)


# -- config/engine wiring ------------------------------------------------
def test_engine_m3_fusion_config(tmp_path):
    import json

    from veritasfi_tpu.config import Config
    from veritasfi_tpu.engine import RAGEngine

    src = tmp_path / "src"
    src.mkdir()
    rows = [{"start": 1, "end": 1, "date_published": "2024-01-01"}]
    for i in range(6):
        rows.append({"content": f"chunk {i} revenue tok{i}",
                     "page_number": i + 1})
    (src / "a.json").write_text(json.dumps(rows))

    cfg = Config(persist_directory=str(tmp_path / "idx"))
    cfg.encoder.model_name = "nonexistent-model"   # hash embed + tiny M3
    cfg.retrieval.native_bm25 = False
    cfg.retrieval.m3_fusion = True
    cfg.retrieval.m3_doc_max_length = 32
    eng = RAGEngine(cfg)
    eng.create_collection("c", str(src))
    r = eng.create_retriever(3, "c")
    assert r.m3_scorer is not None
    chunks = r.invoke("revenue tok2", [])
    assert chunks and all("m3_score" in c for c in chunks)
    scores = [c["m3_score"] for c in chunks]
    assert scores == sorted(scores, reverse=True)
    # scorer is cached per collection
    assert eng.create_retriever(3, "c").m3_scorer is r.m3_scorer
    # batch path annotates identically to sequential invokes
    batch = r.invoke_batch([("revenue tok2", []), ("revenue tok3", [])])
    assert batch[0] == r.invoke("revenue tok2", [])


def test_m3_eval_small():
    from veritasfi_tpu.evals.m3_eval import run_m3_eval

    r = run_m3_eval(seed=0, steps=40, n_queries=8, n_filler=24,
                    candidates=12)
    arms = r["detail"]["per_arm"]
    assert set(arms) == {"dense", "sparse", "colbert", "fused"}
    for a in arms.values():
        for v in a.values():
            assert 0.0 <= v <= 1.0
    assert r["value"] == arms["fused"]["ndcg"]


# -- full checkpoint-dir loader (RECIPES.md real-weight path) ------------
def test_load_m3_encoder_from_dir(tmp_path):
    """A synthetic BGE-M3-layout checkpoint dir (HF XLM-R-style trunk +
    FlagEmbedding sparse_linear.pt / colbert_linear.pt head files) loads
    in one call; dense head matches the plain encoder loader bit-close
    and head shapes come from the checkpoint, not guesses."""
    transformers = pytest.importorskip("transformers")
    torch = pytest.importorskip("torch")
    from transformers import BertConfig, BertModel, BertTokenizerFast

    d = tmp_path / "m3ckpt"
    cfg = BertConfig(vocab_size=200, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=2, intermediate_size=64,
                     max_position_embeddings=64)
    BertModel(cfg).save_pretrained(d)
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + \
        [f"tok{i}" for i in range(50)] + \
        ["revenue", "margin", "what", "was", "the", "quarterly"]
    vf = d / "vocab.txt"
    vf.write_text("\n".join(vocab))
    BertTokenizerFast(vocab_file=str(vf), do_lower_case=True
                      ).save_pretrained(d)
    g = torch.Generator().manual_seed(0)
    torch.save({"weight": torch.randn(1, 32, generator=g),
                "bias": torch.randn(1, generator=g)},
               d / "sparse_linear.pt")
    torch.save({"weight": torch.randn(24, 32, generator=g),
                "bias": torch.randn(24, generator=g)},
               d / "colbert_linear.pt")

    from veritasfi_tpu.models.hf_loader import load_encoder_from_dir
    from veritasfi_tpu.models.m3_heads import load_m3_encoder_from_dir

    enc = load_m3_encoder_from_dir(str(d), max_length=64)
    assert enc.arch.colbert_dim == 24          # read from the checkpoint
    texts = ["what was the quarterly revenue", "margin tok3 tok4"]
    e = enc.encode_multi(texts)
    assert e.colbert.shape[2] == 24
    # dense head == the plain encoder loader's embedding (same trunk)
    plain = load_encoder_from_dir(str(d), max_length=64)
    np.testing.assert_allclose(e.dense, plain.encode(texts), atol=2e-5)
    # specials derived from the HF tokenizer: CLS/SEP carry no weight
    hf = enc.tokenizer.hf
    for sid in (hf.cls_token_id, hf.sep_token_id):
        assert np.all(e.sparse[e.ids == sid] == 0.0)
    # missing head file is a hard error naming the head
    (d / "colbert_linear.pt").unlink()
    with pytest.raises(FileNotFoundError, match="colbert_linear"):
        load_m3_encoder_from_dir(str(d))


# -- checkpoint-layout loader -------------------------------------------
def test_load_m3_head_params_maps_flag_layout(enc):
    h, dc = enc.dim, enc.arch.colbert_dim
    rng = np.random.default_rng(0)
    state = {"sparse_linear.weight": rng.normal(size=(1, h)),
             "sparse_linear.bias": rng.normal(size=(1,)),
             "colbert_linear.weight": rng.normal(size=(dc, h)),
             "colbert_linear.bias": rng.normal(size=(dc,))}
    params = load_m3_head_params(enc.params, state, colbert_dim=dc)
    assert params["params"]["sparse_linear"]["kernel"].shape == (h, 1)
    assert params["params"]["colbert_linear"]["kernel"].shape == (h, dc)
    # wrong colbert_dim is a hard error, not silent misload
    with pytest.raises(ValueError):
        load_m3_head_params(enc.params, state, colbert_dim=dc + 1)
    # grafted params still run the forward
    enc2 = M3Encoder(preset="tiny-test", max_length=64, params=params)
    e = enc2.encode_multi(["revenue grew"])
    assert e.dense.shape == (1, h)
