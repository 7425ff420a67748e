"""Single-readback serve path: retrieve + fuse + rerank in ONE device program.

Why this exists: the transport between host and TPU costs ~28 ms per host
readback (measured; enqueueing programs is free/async). The classic path
needs two readbacks per query — search results (for host fusion) and rerank
scores (for host selection) — putting a ~56 ms floor under the p50 before
any compute. This module moves the *host fusion loop itself* onto the
device, so one jitted program runs:

  encoder forward -> dense/title/neighbor search (ensemble._search_body)
  -> ordered dedup-union fusion with bundle gathering + prev/next expansion
     (a lax.while_loop replay of EnsembleRetriever._dense_path/_title_path/
     _bm25_path, reference: src/utils/ensembleRetriever.py:62-233)
  -> optional candidate-stage M3 fusion (dense+sparse+ColBERT gather+score
     over the emitted pool, stable reorder, top rerank_cap — the classic
     path's retrieval.m3_fusion hook without its extra dispatch)
  -> rerank pair assembly from a device-resident pre-tokenized passage
     matrix -> cross-encoder forward (yes-logit / classifier logit)
  -> time scores + candidate similarity matrix
  -> greedy bundle-capped selection (rank_chunk, vllmManager.py:430-483)

and the host reads back a few-KB pytree ONCE. BM25 stays host-side (it
depends only on the query string, so it runs *before* the dispatch and its
top-k rows are passed in as inputs).

Output parity: the candidate list (rows, emission groups, path tags,
scores) and the selected bundle ids are bit-identical to
EnsembleRetriever.invoke + rank_chunk over the capped candidate list —
tested against that oracle in tests/test_fused_serve.py.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ingest.corpus import CorpusIndex, normalize_rows
from ..rerank.fusion import select_content
from ..utils.profiler import profiler
from .ensemble import _search_dispatch
from .m3_scorer import _m3_scores

_F32 = jnp.float32
PATH_NAMES = ("FAISS", "Title Summary", "BM25")


def _padded_members(indptr: np.ndarray, members: np.ndarray,
                    num_groups: int) -> Tuple[np.ndarray, np.ndarray]:
    """CSR -> padded [G, M] member matrix (-1 pad) + [G] sizes."""
    sizes = (indptr[1:] - indptr[:-1]).astype(np.int32)
    width = max(int(sizes.max()) if num_groups else 0, 1)
    pad = np.full((max(num_groups, 1), width), -1, np.int32)
    for g in range(num_groups):
        row = members[indptr[g]:indptr[g + 1]]
        pad[g, : len(row)] = row
    return pad, sizes if num_groups else np.zeros(1, np.int32)


# ---------------------------------------------------------------------------
# device-side fusion loop
# ---------------------------------------------------------------------------
def _fuse(top_s, top_i, ts_s, ts_i, cand, eff, bm25_rows, bm25_scores,
          bundle_code, bundle_pad, title_pad, *,
          k, ts_k, mt, bm25_k, steps, expand, trigger, accept, emc, cap):
    """Replay the host fusion loop on device.

    Proposal order (exactly EnsembleRetriever.invoke): dense hits qi-major
    then rank-minor; title hits rank-major then member-minor; BM25 hits in
    rank order. Each accepted proposal emits one group: [reversed prev
    expansion] + [bundle rows | the hit] + [next expansion].
    Stops when `cap` candidate rows are emitted (the rerank candidate cap —
    chunks[:cap] truncation semantics preserved, including mid-group cuts).
    """
    num_q = top_i.shape[0]
    n = bundle_code.shape[0]
    mb = bundle_pad.shape[1]
    p_dense = num_q * k
    p_title = ts_k * mt
    p_total = p_dense + p_title + bm25_k
    eb = emc + mb + emc                       # emission buffer slots

    def decode(p):
        def dense(_):
            qi, j = p // k, p % k
            return top_i[qi, j], top_s[qi, j], jnp.int32(0), qi, j

        def title(_):
            p2 = p - p_dense
            t, m = p2 // mt, p2 % mt
            row = title_pad[ts_i[t], m] if mt else jnp.int32(-1)
            return row, ts_s[t], jnp.int32(1), jnp.int32(0), jnp.int32(0)

        def bm25(_):
            p3 = p - p_dense - p_title
            return (bm25_rows[p3], bm25_scores[p3], jnp.int32(2),
                    jnp.int32(0), jnp.int32(0))

        branches = []
        branches.append(dense if p_dense else bm25)
        branches.append(title if p_title else bm25)
        branches.append(bm25)
        phase = jnp.where(p < p_dense, 0, jnp.where(p < p_dense + p_title,
                                                    1, 2))
        return jax.lax.switch(phase, branches, None)

    def accept_proposal(state, idx, score, path, qi, j):
        seen, out_row, out_group, out_score, out_path, n_out, n_group = state
        safe = jnp.clip(idx, 0, n - 1)

        code = bundle_code[safe]
        has_b = code >= 0
        b_row = bundle_pad[jnp.maximum(code, 0)]
        solo = jnp.full((mb,), -1, jnp.int32).at[0].set(idx)
        mid = jnp.where(has_b, b_row, solo)                  # [MB]
        mid_valid = mid >= 0
        mid_len = mid_valid.sum().astype(jnp.int32)
        seen = seen.at[jnp.where(mid_valid, mid, n)].set(True)
        seen = seen.at[safe].set(True)

        prev_buf = jnp.full((emc,), -1, jnp.int32)
        next_buf = jnp.full((emc,), -1, jnp.int32)
        pcnt = jnp.int32(0)
        ncnt = jnp.int32(0)
        ids_len = mid_len
        if expand:
            # probe tables: cand[:, :k*steps] prev walks, rest next walks,
            # column t*k + j = step-t neighbor of hit j (ensemble._search_body)
            active = (path == 0) & (score > trigger)
            for _ in range(max(emc - 1, 0)):
                top_ok = active & (ids_len < emc)
                p_col = jnp.clip(pcnt, 0, steps - 1) * k + j
                p_row = jnp.where(pcnt < steps, cand[qi, p_col], -1)
                p_eff = jnp.where(pcnt < steps, eff[qi, p_col], 0.0)
                p_safe = jnp.clip(p_row, 0, n - 1)
                acc_p = (top_ok & (p_row >= 0) & (p_eff > accept)
                         & ~seen[p_safe])
                prev_buf = prev_buf.at[
                    jnp.where(acc_p, pcnt, emc)].set(p_row, mode="drop")
                seen = seen.at[jnp.where(acc_p, p_safe, n)].set(True)
                pcnt = pcnt + acc_p
                ids_len = ids_len + acc_p

                # NOTE: the reference checks the size cap only at the loop
                # top (ensembleRetriever.py:89), so prev+next accepted in
                # the same iteration can exceed it by one — `top_ok` is NOT
                # recomputed before the next-side probe, preserving that.
                n_col = k * steps + jnp.clip(ncnt, 0, steps - 1) * k + j
                n_row = jnp.where(ncnt < steps, cand[qi, n_col], -1)
                n_eff = jnp.where(ncnt < steps, eff[qi, n_col], 0.0)
                n_safe = jnp.clip(n_row, 0, n - 1)
                acc_n = (top_ok & (n_row >= 0) & (n_eff > accept)
                         & ~seen[n_safe])
                next_buf = next_buf.at[
                    jnp.where(acc_n, ncnt, emc)].set(n_row, mode="drop")
                seen = seen.at[jnp.where(acc_n, n_safe, n)].set(True)
                ncnt = ncnt + acc_n
                ids_len = ids_len + acc_n
                active = active & (acc_p | acc_n)

        # emit: reversed prevs ++ mid ++ nexts
        s = jnp.arange(eb, dtype=jnp.int32)
        total = pcnt + mid_len + ncnt
        prev_pick = prev_buf[jnp.clip(pcnt - 1 - s, 0, emc - 1)]
        mid_pick = mid[jnp.clip(s - pcnt, 0, mb - 1)]
        next_pick = next_buf[jnp.clip(s - pcnt - mid_len, 0, emc - 1)]
        row_s = jnp.where(s < pcnt, prev_pick,
                          jnp.where(s < pcnt + mid_len, mid_pick, next_pick))
        write = jnp.where(s < total, n_out + s, cap)        # cap slot drops
        write = jnp.where(write < cap, write, cap)
        out_row = out_row.at[write].set(row_s, mode="drop")
        out_group = out_group.at[write].set(n_group, mode="drop")
        out_score = out_score.at[write].set(score.astype(_F32), mode="drop")
        out_path = out_path.at[write].set(path, mode="drop")
        return (seen, out_row, out_group, out_score, out_path,
                n_out + total, n_group + 1)

    def body(carry):
        p, state = carry
        idx, score, path, qi, j = decode(p)
        seen = state[0]
        safe = jnp.clip(idx, 0, n - 1)
        fresh = (idx >= 0) & (idx < n) & ~seen[safe]
        state = jax.lax.cond(
            fresh,
            lambda st: accept_proposal(st, idx, score, path, qi, j),
            lambda st: st, state)
        return p + 1, state

    def cond(carry):
        p, state = carry
        return (p < p_total) & (state[5] < cap)

    init = (
        jnp.zeros((n + 1,), bool),
        jnp.full((cap,), -1, jnp.int32),
        jnp.zeros((cap,), jnp.int32),
        jnp.zeros((cap,), _F32),
        jnp.zeros((cap,), jnp.int32),
        jnp.int32(0),
        jnp.int32(0),
    )
    _, state = jax.lax.while_loop(cond, body, (jnp.int32(0), init))
    _, out_row, out_group, out_score, out_path, n_out, n_group = state
    return out_row, out_group, out_score, out_path, jnp.minimum(n_out, cap)


# ---------------------------------------------------------------------------
# rerank pair assembly + greedy selection
# ---------------------------------------------------------------------------
def _assemble_pairs(out_row, prefix, prefix_len, suffix, passage_toks,
                    passage_len, budget, *, seq, pad_id):
    """Build [C, seq] cross-encoder rows on device:
    prefix + passage[:budget] + suffix.

    Covers both reranker families:
      * encoder (EncoderReranker.encode_pairs_cached): prefix =
        [cls]+query+[sep], suffix = [sep];
      * decoder (CrossEncoderReranker.encode_pair): prefix =
        [bos]+'A: {q}'+'\\n', suffix = '\\n'+instruction prompt.
    ``budget`` (host scalar) is the family-specific passage token cap."""
    cap = out_row.shape[0]
    lp = passage_toks.shape[1]
    safe = jnp.maximum(out_row, 0)
    ptoks = passage_toks[safe]                       # [C, LP]
    plen = jnp.minimum(passage_len[safe], jnp.maximum(budget, 0))   # [C]
    pos = jnp.arange(seq, dtype=jnp.int32)[None, :]  # [1, seq]
    gather = jnp.clip(pos - prefix_len, 0, lp - 1)
    shifted = jnp.take_along_axis(ptoks, jnp.broadcast_to(
        gather, (cap, seq)), axis=1)
    s_len = suffix.shape[0]
    s_gather = jnp.clip(pos - prefix_len - plen[:, None], 0, s_len - 1)
    suf = suffix[s_gather]                           # [C, seq]
    in_prefix = pos < prefix_len
    in_passage = (pos >= prefix_len) & (pos < prefix_len + plen[:, None])
    total = prefix_len + plen[:, None] + s_len
    in_suffix = (pos >= prefix_len + plen[:, None]) & (pos < total)
    pre = jnp.broadcast_to(prefix[None, :seq], (cap, seq))
    ids = jnp.where(in_prefix, pre,
                    jnp.where(in_passage, shifted,
                              jnp.where(in_suffix, suf, pad_id)))
    mask = (pos < total).astype(jnp.int32)
    invalid = out_row < 0
    # invalid slots: attend to position 0 only (keeps softmax well-defined)
    mask = jnp.where(invalid[:, None], (pos == 0).astype(jnp.int32), mask)
    ids = jnp.where(invalid[:, None], pad_id, ids)
    return ids, mask


def _rank_chunk_device(combined, out_group, valid, sim, *,
                       chunk_topk, sim_threshold):
    """Greedy bundle-capped selection (rerank.fusion.rank_chunk) on device.
    Returns (selected group ids [chunk_topk], count) — host reverses.

    Preserved quirk: the similarity check indexes the candidate-level matrix
    with *group ids* (vllmManager.py:476-480); within the capped list group
    ids are < cap because each group emits at least one row."""
    cap = combined.shape[0]
    neg = jnp.where(valid, -combined, jnp.inf)
    _, order = jax.lax.sort(
        (neg, jnp.arange(cap, dtype=jnp.int32)), num_keys=2)
    bsize = (valid[None, :]
             & (out_group[:, None] == out_group[None, :])).sum(
        axis=1).astype(jnp.int32)

    def body(r, st):
        sel, cnt, size = st
        i = order[r]
        ok = valid[i]
        g = out_group[i]
        in_sel = jnp.any(sel == g)
        over = size + bsize[i] > chunk_topk
        sims = sim[i, jnp.clip(sel, 0, cap - 1)]
        # group ids >= cap can only appear when an M3 reorder promoted a
        # late-emitted group into the capped list; they have no column in
        # the candidate-level matrix, so they sit out the similarity veto
        # (rerank.fusion.rank_chunk applies the same rule — the host and
        # device selections must agree bit-for-bit)
        simhit = jnp.any((jnp.arange(chunk_topk) < cnt) & (sel < cap)
                         & (sims > sim_threshold))
        acc = ok & ~in_sel & ~over & ~simhit
        sel = sel.at[jnp.where(acc, cnt, chunk_topk)].set(g, mode="drop")
        return (sel, cnt + acc, size + jnp.where(acc, bsize[i], 0))

    sel0 = jnp.full((chunk_topk,), -1, jnp.int32)
    sel, cnt, _ = jax.lax.fori_loop(0, cap, body,
                                    (sel0, jnp.int32(0), jnp.int32(0)))
    return sel, cnt


# ---------------------------------------------------------------------------
# the serve path
# ---------------------------------------------------------------------------
class FusedServePath:
    """One-readback retrieve+rerank for a corpus + encoder + cross-encoder.

    Holds device-resident state (embeddings, metadata arrays, padded CSR
    maps, pre-tokenized passage matrix) and a single jitted program per
    (num_queries,) shape. ``serve()`` performs host BM25 + tokenization,
    one dispatch, one device_get, then formats reference-schema chunk dicts.
    """

    def __init__(self, corpus: CorpusIndex, reranker, encoder=None,
                 embed_fn=None, bm25=None, *,
                 k: int = 10, ts_k: Optional[int] = None,
                 bm25_k: Optional[int] = None,
                 enable_expand: bool = True, depth: int = 2048,
                 expand_trigger: float = 0.72, expand_accept: float = 0.66,
                 expand_max_chunks: int = 4,
                 rerank_cap: int = 50, chunk_topk: int = 5,
                 sim_threshold: float = 0.9,
                 corpus_dtype: str = "float32",
                 device_emb=None, device_ts_emb=None,
                 m3_scorer=None, m3_pool: Optional[int] = None) -> None:
        if encoder is None and embed_fn is None:
            raise ValueError("need encoder or embed_fn")
        self.corpus = corpus
        self.reranker = reranker
        self.encoder = encoder
        self.embed_fn = embed_fn
        self.bm25 = bm25
        self.k = min(k, corpus.num_chunks)
        # title path needs BOTH title texts and title embeddings (a corpus
        # saved without ts_embeddings still lists titles; the classic
        # engine disables the path the same way — ts_dense is None there)
        ts_arr = corpus.ts_embeddings
        t = (len(corpus.title_texts)
             if ts_arr is not None and len(ts_arr) else 0)
        self.ts_k = min(ts_k if ts_k is not None else k, t)
        self.bm25_k = (bm25_k if bm25_k is not None else k) if bm25 else 0
        self.enable_expand = enable_expand
        self.depth = depth
        self.trigger = expand_trigger
        self.accept = expand_accept
        self.emc = expand_max_chunks
        self.rerank_cap = rerank_cap
        self.chunk_topk = chunk_topk
        self.sim_threshold = sim_threshold
        # Candidate-stage M3 fusion folded INTO the serve program: the
        # classic path's rerank_chunks hook is a separate gather+score
        # dispatch (+1 transport round-trip, ~30 ms on this relay —
        # M3_r04.json); here the same _m3_scores math runs between the
        # fusion loop and pair assembly, so it costs zero readbacks. The
        # fusion loop over-emits to ``m3_pool`` rows and the M3 order
        # picks the top ``rerank_cap`` — identical to the classic
        # "reorder the full list, then cap" whenever the pool holds every
        # candidate (the parity tests pin exactly that).
        self.m3 = m3_scorer
        self._fuse_cap = rerank_cap
        if m3_scorer is not None:
            self._fuse_cap = max(m3_pool if m3_pool is not None
                                 else 2 * rerank_cap, rerank_cap)

        n = corpus.num_chunks
        # content matrix in the configured storage dtype, mirroring the
        # classic engine (retrieval.corpus_dtype: bfloat16 halves HBM and
        # routes the streaming top-k through the Pallas MIPS kernel —
        # without this the serve path would keep its own fp32 copy and
        # defeat the bf16 mode's memory budget at 10M-row scale). The
        # title matrix stays fp32, as in EnsembleRetriever. In bf16 mode
        # the sim-dedup cosines use the bf16-rounded vectors; like the
        # search scores, the only delta vs fp32 is storage rounding.
        # ``device_emb``/``device_ts_emb``: share the classic engine's
        # device matrices (DenseRetriever.corpus — already normalized and
        # cast) instead of materializing a second multi-GB copy.
        if corpus_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                f"corpus_dtype must be float32|bfloat16, got {corpus_dtype!r}")
        if device_emb is not None:
            if (device_emb.dtype == jnp.bfloat16
                    and corpus_dtype == "float32"):
                # an upcast cannot restore the rounded-away precision, so
                # the "bit-identical vectors across paths" contract would
                # silently break — refuse rather than diverge from a true
                # fp32 classic engine
                raise ValueError(
                    "device_emb is bfloat16 but corpus_dtype='float32'; "
                    "share a matrix of the configured dtype")
            # no-op astype still allocates a fresh device buffer outside
            # jit; only convert on an actual dtype mismatch
            self._emb = (device_emb
                         if device_emb.dtype == jnp.dtype(corpus_dtype)
                         else device_emb.astype(jnp.dtype(corpus_dtype)))
        else:
            # normalize fp32 first, cast on host (exactly DenseRetriever's
            # order, so bf16 unit vectors are bit-identical across paths)
            self._emb = jnp.asarray(
                normalize_rows(corpus.embeddings).astype(
                    jnp.dtype(corpus_dtype)))
        ts = corpus.ts_embeddings
        if device_ts_emb is not None:
            if device_ts_emb.dtype != jnp.float32:
                # the title matrix stays fp32 in every path (it is small;
                # EnsembleRetriever never casts it)
                raise ValueError(
                    f"device_ts_emb must be float32, got "
                    f"{device_ts_emb.dtype}")
            self._ts_emb = device_ts_emb
        else:
            self._ts_emb = (jnp.asarray(normalize_rows(ts))
                            if ts is not None and len(ts)
                            else self._emb[:1])
        self._prev = jnp.asarray(corpus.prev_idx.astype(np.int32))
        self._next = jnp.asarray(corpus.next_idx.astype(np.int32))
        self._bundle_code = jnp.asarray(corpus.bundle_code.astype(np.int32))
        bpad, _ = _padded_members(corpus.bundle_indptr, corpus.bundle_members,
                                  len(corpus.bundle_names))
        tpad, _ = _padded_members(corpus.title_indptr, corpus.title_members,
                                  len(corpus.title_texts))
        self._bundle_pad = jnp.asarray(bpad)
        self._title_pad = jnp.asarray(tpad)
        self._mt = int(tpad.shape[1]) if self.ts_k > 0 else 0
        self._date_days = jnp.asarray(corpus.date_days.astype(np.float32))

        # reranker family: decoder (gemma yes-logit) vs encoder (CLS logit)
        rr = reranker
        self._decoder = hasattr(rr, "yes_id")
        # the query-independent suffix comes from the reranker's canonical
        # layout (same source _query_prefix uses at serve time)
        _, _, suffix = rr.pair_layout("")
        if self._decoder:
            from ..models.reranker import yes_logit_score

            toks = [rr._encode_raw("B: " + t)[: rr.passage_max_length]
                    for t in corpus.texts]
            self._score_fn = (
                lambda p, i, m: yes_logit_score(rr.module, p, i, m, rr.yes_id))
            seq_max = rr.passage_max_length + len(suffix)
        else:
            toks = [rr.tokenize_passage(t)[: rr.passage_max_length]
                    for t in corpus.texts]
            self._score_fn = lambda p, i, m: rr.module.apply(p, i, m)
            seq_max = rr.passage_max_length

        # pre-tokenized passage matrix [N, LP] + lengths
        lp = max(max((len(t) for t in toks), default=1), 1)
        pmat = np.full((n, lp), rr.arch.pad_id, np.int32)
        plen = np.zeros((n,), np.int32)
        for i, t in enumerate(toks):
            pmat[i, : len(t)] = t
            plen[i] = len(t)
        self._passage_toks = jnp.asarray(pmat)
        self._passage_len = jnp.asarray(plen)
        self._plen_max = int(plen.max()) if n else 0
        self._suffix_host = suffix
        self._seq = max(-(-seq_max // 64) * 64, 64)
        self._suffix = jnp.asarray(
            np.asarray(suffix, np.int32) if suffix
            else np.asarray([rr.arch.pad_id], np.int32))

        self._jit = jax.jit(
            self._body,
            static_argnames=("num_q", "enc_len", "with_encoder", "seq"))
        # split variant: search+fuse+assemble and rerank+select as two
        # CHAINED device programs (no host sync between them). Used when
        # the reranker runs the fused int8 Pallas MLP: embedded in the
        # mega-program the custom calls defeat XLA's whole-program
        # scheduling (+5 ms/request measured); in their own program they
        # beat bf16 by ~2 ms. Dispatch is async, so the extra program
        # costs no transport round-trip — still ONE readback per request.
        self._jit_search = jax.jit(
            self._body_search,
            static_argnames=("num_q", "enc_len", "with_encoder", "seq"))
        self._jit_rerank = jax.jit(self._body_rerank)
        self._jit_rerank_batched = jax.jit(self._body_rerank_batched)
        # each host->device transfer costs ~0.3-0.5 ms of enqueue overhead
        # on the relay (measured) — so every per-request input rides in TWO
        # packed arrays (one int32, one float32) instead of eight
        from concurrent.futures import ThreadPoolExecutor

        # sized for wave concurrency: every request's host prep submits a
        # BM25 job here; one worker would serialize a whole wave's preps
        self._bm25_pool = ThreadPoolExecutor(max_workers=4)
        # HF fast tokenizers are not thread-safe and host prep runs in the
        # caller's thread (RetrievalBatcher.submit) — serialize tokenizer use
        import threading

        self._tok_lock = threading.Lock()

    def close(self) -> None:
        self._bm25_pool.shutdown(wait=False)

    # -- the fused program --------------------------------------------------
    def _unpack(self, pack, *, num_q, enc_len, seq, with_encoder):
        """Static-offset unpacking of the ONE packed input transfer (each
        host->device transfer costs ~1.5 ms of enqueue overhead on the
        relay, measured — the f32 section rides as int32 bits and is
        bitcast back on device, which is free).

        int32 layout: [enc ids (num_q*enc_len)] [enc mask (num_q*enc_len)]
                      [prefix (seq)] [bm25 rows (kb)] [prefix_len] [budget]
        f32 tail:     [bm25 scores (kb)] [qdays] [q_emb (num_q*dim), no-enc]
        """
        kb = max(self.bm25_k, 1)
        int_len = 2 * num_q * enc_len + seq + kb + 2   # enc_len=0 w/o enc
        pack_i = pack[:int_len]
        pack_f = jax.lax.bitcast_convert_type(pack[int_len:], _F32)
        off = 0
        enc_ids = enc_mask = q_emb = None
        if with_encoder:
            enc_ids = pack_i[off: off + num_q * enc_len].reshape(
                num_q, enc_len)
            off += num_q * enc_len
            enc_mask = pack_i[off: off + num_q * enc_len].reshape(
                num_q, enc_len)
            off += num_q * enc_len
        prefix = pack_i[off: off + seq]
        off += seq
        bm25_rows = pack_i[off: off + kb]
        off += kb
        prefix_len = pack_i[off]
        budget = pack_i[off + 1]
        bm25_scores = pack_f[:kb]
        qtime_days = pack_f[kb]
        if not with_encoder:
            dim = self._emb.shape[1]
            q_emb = pack_f[kb + 1: kb + 1 + num_q * dim].reshape(num_q, dim)
        return (enc_ids, enc_mask, q_emb, prefix, prefix_len, budget,
                bm25_rows, bm25_scores, qtime_days)

    def _body_search(self, pack, enc_params, m3_corpus, m3_q,
                     *, num_q, enc_len, with_encoder, seq):
        """Stage 1: encoder forward -> tripartite search -> device fusion
        loop -> [M3 candidate-stage fusion] -> rerank pair assembly ->
        time scores."""
        (enc_ids, enc_mask, q_emb_in, prefix, prefix_len, budget, bm25_rows,
         bm25_scores, qtime_days) = self._unpack(
            pack, num_q=num_q, enc_len=enc_len, seq=seq,
            with_encoder=with_encoder)
        if with_encoder:
            q_emb = self.encoder.module.apply(enc_params, enc_ids, enc_mask)
            q_emb = q_emb.astype(_F32)
        else:
            q_emb = q_emb_in
        steps = self.emc - 1
        # disabled paths are compiled OUT (static run_dense/run_ts -> width-0
        # outputs, dead operand); expansion only applies to dense hits, and
        # with run_dense off cand/eff are width-0, so _fuse must not trace
        # its neighbor-probe gathers either
        run_dense = self.k > 0
        run_ts = self.ts_k > 0
        top_s, top_i, ts_s, ts_i, cand, eff = _search_dispatch(
            self._emb, self._ts_emb, q_emb, self._prev, self._next,
            self.k, self.ts_k, steps, self.depth,
            self.enable_expand and run_dense,
            run_dense=run_dense, run_ts=run_ts)

        out_row, out_group, out_score, out_path, n_out = _fuse(
            top_s, top_i, ts_s, ts_i, cand, eff, bm25_rows, bm25_scores,
            self._bundle_code, self._bundle_pad, self._title_pad,
            k=self.k, ts_k=self.ts_k, mt=self._mt, bm25_k=self.bm25_k,
            steps=steps, expand=self.enable_expand and run_dense,
            trigger=self.trigger, accept=self.accept, emc=self.emc,
            cap=self._fuse_cap)

        m3_top = None
        if self.m3 is not None:
            # in-program M3 fusion: gather the pool rows' token
            # representations, score all three heads, stable-reorder by
            # the fused score (exactly M3CandidateScorer.rerank_chunks'
            # argsort), keep the top rerank_cap. Invalid slots sort last
            # with their relative order preserved, as on host.
            d_dense, d_ids, d_sparse, d_col, d_mask, d_tok, wts = m3_corpus
            q_ids, q_dense, q_w, q_col, q_valid = m3_q
            safe_rows = jnp.maximum(out_row, 0)
            take = lambda a: jnp.take(a, safe_rows, axis=0)
            row_valid = out_row >= 0
            m3_all = _m3_scores(
                q_dense, q_ids, q_w, q_col, q_valid,
                take(d_dense), take(d_ids), take(d_sparse), take(d_col),
                take(d_mask), take(d_tok), row_valid, wts)[:, 0]
            pool = out_row.shape[0]
            neg = jnp.where(row_valid, -m3_all, jnp.inf)
            _, order = jax.lax.sort(
                (neg, jnp.arange(pool, dtype=jnp.int32)), num_keys=2)
            order = order[: self.rerank_cap]
            out_row = out_row[order]
            out_group = out_group[order]
            out_score = out_score[order]
            out_path = out_path[order]
            m3_top = m3_all[order]
            n_out = jnp.minimum(n_out, self.rerank_cap)

        ids, mask = _assemble_pairs(
            out_row, prefix, prefix_len, self._suffix,
            self._passage_toks, self._passage_len, budget, seq=seq,
            pad_id=self.reranker.arch.pad_id)
        safe = jnp.maximum(out_row, 0)
        tscores = jnp.maximum(
            0.0, 1.0 - jnp.abs(qtime_days - self._date_days[safe]) / 365.0)
        out = (out_row, out_group, out_score, out_path, n_out,
               ids, mask, tscores)
        return out if m3_top is None else out + (m3_top,)

    def _body_rerank(self, rr_params, ids, mask, out_row, out_group,
                     tscores):
        """Stage 2: cross-encoder forward -> similarity -> greedy
        bundle-capped selection."""
        logits = self._score_fn(rr_params, ids, mask).astype(_F32)
        valid = out_row >= 0
        safe = jnp.maximum(out_row, 0)
        emb_c = self._emb[safe].astype(_F32)
        sim = jnp.matmul(emb_c, emb_c.T,
                         precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=_F32)
        combined = logits + tscores
        sel, sel_cnt = _rank_chunk_device(
            combined, out_group, valid, sim,
            chunk_topk=self.chunk_topk, sim_threshold=self.sim_threshold)
        return logits, sel, sel_cnt

    def _body_rerank_batched(self, rr_params, ids_t, mask_t, row_t,
                             group_t, ts_t):
        """Cross-request rerank: B requests' candidate sets scored in ONE
        [B*cap, seq] cross-encoder forward (bigger GEMMs, one program's
        overhead instead of B), then vmapped greedy selection. The wave
        analogue of the reference's global-lock serialization
        (vllmChatService.py:88-90), one step further than per-request
        programs."""
        ids = jnp.stack(ids_t)                 # [B, cap, seq]
        mask = jnp.stack(mask_t)
        out_row = jnp.stack(row_t)             # [B, cap]
        out_group = jnp.stack(group_t)
        tscores = jnp.stack(ts_t)
        b, cap, seq = ids.shape
        logits = self._score_fn(
            rr_params, ids.reshape(b * cap, seq),
            mask.reshape(b * cap, seq)).astype(_F32).reshape(b, cap)
        valid = out_row >= 0
        safe = jnp.maximum(out_row, 0)
        emb_c = self._emb[safe].astype(_F32)   # [B, cap, dim]
        sim = jnp.matmul(emb_c, jnp.swapaxes(emb_c, 1, 2),
                         precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=_F32)
        combined = logits + tscores
        sel, sel_cnt = jax.vmap(
            lambda c, g, v, s: _rank_chunk_device(
                c, g, v, s, chunk_topk=self.chunk_topk,
                sim_threshold=self.sim_threshold))(
            combined, out_group, valid, sim)
        return logits, sel, sel_cnt

    def _body(self, pack, enc_params, rr_params, m3_corpus, m3_q,
              *, num_q, enc_len, with_encoder, seq):
        (out_row, out_group, out_score, out_path, n_out, ids, mask,
         tscores, *m3_top) = self._body_search(
            pack, enc_params, m3_corpus, m3_q,
            num_q=num_q, enc_len=enc_len, with_encoder=with_encoder, seq=seq)
        logits, sel, sel_cnt = self._body_rerank(
            rr_params, ids, mask, out_row, out_group, tscores)
        return self._pack_out(out_row, out_group, out_score, out_path,
                              n_out, logits, tscores, sel, sel_cnt,
                              m3_top[0] if m3_top else None)

    def _pack_out(self, out_row, out_group, out_score, out_path, n_out,
                  logits, tscores, sel, sel_cnt, m3_top=None):
        """ONE readback leaf: every per-leaf device_get costs extra relay
        latency (~1.3 ms for the old 9-leaf pytree, measured) — f32
        sections ride as int32 bits (bitcast is free on device)."""
        parts = [
            out_row, out_group, out_path, sel,
            jnp.stack([n_out.astype(jnp.int32), sel_cnt.astype(jnp.int32)]),
            jax.lax.bitcast_convert_type(out_score, jnp.int32),
            jax.lax.bitcast_convert_type(logits, jnp.int32),
            jax.lax.bitcast_convert_type(tscores, jnp.int32),
        ]
        if m3_top is not None:
            parts.append(jax.lax.bitcast_convert_type(m3_top, jnp.int32))
        return jnp.concatenate(parts)

    def _unpack_out(self, host):
        """Host-side inverse of _pack_out (numpy views, no copies)."""
        cap, topk = self.rerank_cap, self.chunk_topk
        host = np.asarray(host)
        out_row = host[:cap]
        out_group = host[cap: 2 * cap]
        out_path = host[2 * cap: 3 * cap]
        sel = host[3 * cap: 3 * cap + topk]
        n_out, sel_cnt = host[3 * cap + topk: 3 * cap + topk + 2]
        f = host[3 * cap + topk + 2:].view(np.float32)
        out_score = f[:cap]
        logits = f[cap: 2 * cap]
        tscores = f[2 * cap: 3 * cap]
        out = (out_row, out_group, out_score, out_path, n_out,
               logits, tscores, sel, sel_cnt)
        if self.m3 is not None:
            out = out + (f[3 * cap: 4 * cap],)
        return out

    # -- host orchestration --------------------------------------------------
    def _encoder_tokens(self, inputs: List[str]):
        # the shared canonical tokenization (TextEncoder.tokenize_padded) —
        # the classic search path uses the same call, so the fused path can
        # never embed a different token matrix
        with self._tok_lock:
            return self.encoder.tokenize_padded(inputs)

    def _query_prefix(self, query: str) -> Tuple[List[int], int]:
        """(prefix token list, passage budget) — delegates to the
        reranker's canonical ``pair_layout`` (the suffix was captured at
        construction; it is query-independent in both families)."""
        with self._tok_lock:
            prefix, budget, _ = self.reranker.pair_layout(query)
        return prefix, budget

    def _bm25_inputs(self, query: str):
        kb = self.bm25_k
        rows = np.full((max(kb, 1),), -1, np.int32)
        scores = np.zeros((max(kb, 1),), np.float32)
        if kb > 0:
            ids, sc = self.bm25.invoke(query, kb)
            m = min(kb, len(ids))
            rows[:m] = np.asarray(ids[:m], np.int32)
            scores[:m] = np.asarray(sc[:m], np.float32)
        return rows, scores

    def enqueue(self, query: str, hyde_chunks: Sequence[str],
                query_time) -> Tuple:
        """Host prep + async dispatch; returns the device outputs tuple —
        no host readback. Use finish() to complete. Lets a server enqueue a
        whole wave of requests and pay ONE transport round-trip for all."""
        from ..rerank.fusion import _to_days

        inputs = [query] + list(hyde_chunks)
        with profiler.span("serve_host_prep"):
            pack, num_q, enc_len, seq = self._prep(
                inputs, query, query_time)
            m3_corpus, m3_q = self._m3_args(query)
            with_encoder = self.encoder is not None
            # Pallas custom calls (the int8 fused-MLP rerank) defeat XLA's
            # whole-program scheduling inside the mega-program: run the
            # rerank leg as a second CHAINED dispatch instead (async, no
            # extra readback — measured +5 ms embedded vs -2 ms split).
            split = getattr(self.reranker.arch, "mlp_impl", "xla") == "int8"
            if split:
                (out_row, out_group, out_score, out_path, n_out, rr_ids,
                 rr_mask, tscores, *m3_top) = self._jit_search(
                    pack, self.encoder.params if with_encoder
                    else None, m3_corpus, m3_q, num_q=num_q,
                    enc_len=enc_len, with_encoder=with_encoder, seq=seq)
                logits, sel, sel_cnt = self._jit_rerank(
                    self.reranker.params, rr_ids, rr_mask, out_row,
                    out_group, tscores)
                out = (out_row, out_group, out_score, out_path, n_out,
                       logits, tscores, sel, sel_cnt) + tuple(m3_top)
            else:
                out = self._jit(
                    pack,
                    self.encoder.params if with_encoder else None,
                    self.reranker.params, m3_corpus, m3_q, num_q=num_q,
                    enc_len=enc_len, with_encoder=with_encoder, seq=seq)
        return out

    def _m3_args(self, query: str) -> Tuple[Tuple, Tuple]:
        """(corpus token reps, query-side reps) for the in-program M3
        fusion — empty pytrees when M3 is off. The query encode is a
        CHAINED dispatch (M3CandidateScorer.encode_query_device): its
        outputs stay on device and feed the serve program directly, so
        enabling M3 adds zero transport round-trips."""
        if self.m3 is None:
            return (), ()
        return self.m3.corpus_arrays(), self.m3.encode_query_device(query)

    def _prep(self, inputs: List[str], query: str, query_time):
        """Host prep: tokenization + BM25 + the two packed input transfers."""
        from ..rerank.fusion import _to_days

        # host BM25 overlaps tokenization: the native scorer is a
        # ctypes call (GIL released), the pure-python fallback at least
        # interleaves with the numpy packing work
        bm25_fut = (self._bm25_pool.submit(self._bm25_inputs, query)
                    if self.bm25_k > 0 else None)
        prefix, budget = self._query_prefix(query)
        # static seq bucket from this query's prefix length and the
        # corpus-wide max passage length (the classic path buckets the
        # same way per batch, EncoderReranker.score_tokens)
        row_max = (len(prefix) + min(self._plen_max, max(budget, 0))
                   + len(self._suffix_host))
        seq = min(self._seq, max(-(-row_max // 64) * 64, 64))
        # a very long query can make prefix+suffix alone exceed the
        # standard bucket (budget < 0, empty passages) — grow the bucket
        # rather than truncating the prefix, matching the classic path's
        # length-derived bucketing (EncoderReranker.score_tokens)
        base = len(prefix) + len(self._suffix_host)
        if base > seq:
            seq = max(-(-base // 64) * 64, 64)
        num_q = len(inputs)
        with_encoder = self.encoder is not None
        if with_encoder:
            ids, mask = self._encoder_tokens(inputs)
            enc_len = ids.shape[1]
            q_emb = None
        else:
            q_emb = normalize_rows(
                np.asarray(self.embed_fn(inputs), np.float32))
            ids = mask = None
            enc_len = 0
        if bm25_fut is not None:
            bm25_rows, bm25_scores = bm25_fut.result()
        else:
            bm25_rows, bm25_scores = self._bm25_inputs(query)

        # every per-request input rides in ONE transfer (~1.5 ms of
        # enqueue overhead per host->device transfer on the relay,
        # measured) — the f32 section travels as int32 bits
        kb = max(self.bm25_k, 1)
        ni = 2 * num_q * enc_len + seq + kb + 2
        nf = kb + 1 + (0 if with_encoder else num_q * self._emb.shape[1])
        pack = np.empty((ni + nf,), np.int32)
        off = 0
        if with_encoder:
            pack[off: off + num_q * enc_len] = ids.ravel()
            off += num_q * enc_len
            pack[off: off + num_q * enc_len] = mask.ravel()
            off += num_q * enc_len
        pack[off: off + seq] = self.reranker.arch.pad_id
        pack[off: off + min(len(prefix), seq)] = prefix[:seq]
        off += seq
        pack[off: off + kb] = bm25_rows
        off += kb
        pack[off] = len(prefix)
        pack[off + 1] = budget
        pack_f = pack[ni:].view(np.float32)
        pack_f[:kb] = bm25_scores
        pack_f[kb] = np.float32(_to_days(query_time))
        if not with_encoder:
            pack_f[kb + 1:] = q_emb.ravel()

        return jnp.asarray(pack), num_q, enc_len, seq

    def finish(self, out) -> Tuple[List[Dict], List[int], Dict]:
        """ONE host readback, then build reference-schema outputs."""
        with profiler.span("serve_readback"):
            host = jax.device_get(out)
        return self._format(host)

    @profiler.profile_function(name="fused_serve")
    def serve(self, query: str, hyde_chunks: Sequence[str], query_time
              ) -> Tuple[List[Dict], List[int], Dict]:
        """retrieve + rerank + select in one dispatch and one readback.

        Returns (candidate chunk dicts (capped at rerank_cap), selected
        bundle ids reversed (rank_chunk contract), diagnostics)."""
        return self.finish(self.enqueue(query, hyde_chunks, query_time))

    def enqueue_search(self, query: str, hyde_chunks: Sequence[str],
                       query_time) -> Tuple[Tuple, int]:
        """Host prep + async dispatch of the SEARCH leg only (encoder ->
        tripartite search -> fusion -> pair assembly). Returns
        (device outputs, seq bucket); complete a wave of these with
        ``finish_wave`` — the rerank forwards of the whole wave run as ONE
        batched device program."""
        inputs = [query] + list(hyde_chunks)
        with profiler.span("serve_host_prep"):
            pack, num_q, enc_len, seq = self._prep(
                inputs, query, query_time)
            m3_corpus, m3_q = self._m3_args(query)
            with_encoder = self.encoder is not None
            out = self._jit_search(
                pack, self.encoder.params if with_encoder
                else None, m3_corpus, m3_q, num_q=num_q, enc_len=enc_len,
                with_encoder=with_encoder, seq=seq)
        return out, seq

    def finish_wave(self, entries: Sequence[Tuple[Tuple, int]]
                    ) -> List[Tuple[List[Dict], List[int], Dict]]:
        """Complete a wave of ``enqueue_search`` entries: group by seq
        bucket, run each group's cross-encoder forwards as ONE batched
        program (padded to the next power of two to bound compile
        variants — pad slots alias request 0's arrays, no copies), then a
        single device_get over the small outputs (the [cap, seq] token
        matrices never leave the device — readback bandwidth is ~50 MB/s
        on this relay)."""
        groups: Dict[int, List[int]] = {}
        for i, (_, seq) in enumerate(entries):
            groups.setdefault(seq, []).append(i)
        batched = {}
        for seq, idxs in groups.items():
            b = 1
            while b < len(idxs):
                b *= 2
            padded = idxs + [idxs[0]] * (b - len(idxs))
            ids_t = tuple(entries[i][0][5] for i in padded)
            mask_t = tuple(entries[i][0][6] for i in padded)
            row_t = tuple(entries[i][0][0] for i in padded)
            group_t = tuple(entries[i][0][1] for i in padded)
            ts_t = tuple(entries[i][0][7] for i in padded)
            batched[seq] = self._jit_rerank_batched(
                self.reranker.params, ids_t, mask_t, row_t, group_t, ts_t)
        with_m3 = self.m3 is not None
        small = [out[:5] + (out[7],) + ((out[8],) if with_m3 else ())
                 for out, _ in entries]
        with profiler.span("serve_wave_readback"):
            h_small, h_batched = jax.device_get((small, batched))
        results: List = [None] * len(entries)
        for seq, idxs in groups.items():
            logits_b, sel_b, cnt_b = h_batched[seq]
            for j, i in enumerate(idxs):
                (out_row, out_group, out_score, out_path, n_out,
                 tscores, *m3_top) = h_small[i]
                results[i] = self._format(
                    (out_row, out_group, out_score, out_path, n_out,
                     logits_b[j], tscores, sel_b[j], cnt_b[j])
                    + tuple(m3_top))
        return results

    def serve_wave(self, requests: Sequence[Tuple[str, Sequence[str], object]],
                   batch_rerank: bool = False
                   ) -> List[Tuple[List[Dict], List[int], Dict]]:
        """Serve B concurrent requests with ONE transport round-trip total:
        enqueue every request's program (dispatch is async/free), then a
        single device_get over all outputs. This is the TPU serving shape —
        the reference serializes every session behind a reranker lock
        (vllmChatService.py:88-90).

        ``batch_rerank`` runs the wave's cross-encoder forwards as ONE
        [B*cap, seq] program instead. MEASURED SLOWER on v5e (16.3 ->
        19.8 ms/request going B=2 -> 16, vs 18.1 for the per-request
        mega-program): a [50*seq, H] forward already saturates the MXU, so
        batching only grows working sets. Kept as an option because the
        tradeoff may flip on other parts/shapes (e.g. tiny caps)."""
        if batch_rerank and len(requests) > 1:
            entries = [self.enqueue_search(q, h, t) for q, h, t in requests]
            return self.finish_wave(entries)
        outs = [self.enqueue(q, h, t) for q, h, t in requests]
        with profiler.span("serve_wave_readback"):
            host = jax.device_get(outs)
        return [self._format(h) for h in host]

    def _format(self, host_out) -> Tuple[List[Dict], List[int], Dict]:
        if not isinstance(host_out, (tuple, list)):
            host_out = self._unpack_out(host_out)    # packed single leaf
        (out_row, out_group, out_score, out_path, n_out, logits,
         tscores, sel, sel_cnt, *m3_top) = host_out
        m3 = m3_top[0] if m3_top else None
        chunks: List[Dict] = []
        for i in range(int(n_out)):
            r = int(out_row[i])
            if r < 0:
                continue
            chunk = {
                "retriever": PATH_NAMES[int(out_path[i])],
                "score": float(out_score[i]),
                "page_content": self.corpus.texts[r],
                "metadata": self.corpus.metadata(r),
                "bundle_id": int(out_group[i]),
                "_row": r,
            }
            if m3 is not None:
                # same annotation M3CandidateScorer.rerank_chunks makes
                # on the classic path
                chunk["m3_score"] = float(m3[i])
            chunks.append(chunk)
        selected = [int(g) for g in sel[: int(sel_cnt)]][::-1]
        diag = {"logits": logits[: int(n_out)],
                "time_scores": tscores[: int(n_out)],
                "n_candidates": int(n_out)}
        return chunks, selected, diag

    def answer_context(self, query: str, hyde_chunks: Sequence[str],
                       query_time, min_bundle_chars: int = 50):
        """Full get_rag_content equivalent (vllmChatService.py:32-70)."""
        chunks, sel, diag = self.serve(query, hyde_chunks, query_time)
        content, times, selected = select_content(
            chunks, sel, min_bundle_chars=min_bundle_chars)
        return content, times, selected, chunks, diag
