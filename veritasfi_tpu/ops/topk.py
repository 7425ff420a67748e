"""Dense MIPS / cosine top-k retrieval ops (XLA baseline).

This is the TPU-native replacement for FAISS ``IndexFlatIP`` exact search
(reference: src/utils/faissRetriever.py:18-37 — L2-normalized inner product,
searched at depth 2048 from ensembleRetriever.py:66).

Design notes (TPU-first):

* Embeddings are L2-normalized so cosine == inner product; the score matrix
  is one MXU matmul with fp32 accumulation (bf16 storage optional).
* ``lax.top_k`` over the matmul output is the XLA baseline; a fused Pallas
  matmul+top-k kernel (ops/pallas_mips.py) avoids materializing [Q, N]
  scores in HBM for large corpora.
* The reference materializes a depth-2048 id->score table per query only to
  look up neighbor-chunk scores and apply the depth cutoff
  (ensembleRetriever.py:66-68,93,102). We replace that with two exact,
  scalable primitives: ``scores_at`` (gather + dot for the neighbors we
  actually probe) and ``rank_of`` (a counting reduction giving each
  candidate's rank in the full corpus ordering, so the "is it within depth
  2048" cutoff is exact without a 2048-wide sort).
* Stable ordering: ties are broken toward the lower corpus index, matching
  FAISS, by biasing scores with a -index epsilon before top_k.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

# Exact-parity matmul precision. On TPU, HIGHEST runs the MXU in fp32
# (multi-pass); retrieval matrices are small enough that this is cheap, and
# recall parity with fp32 FAISS requires it (SURVEY.md §7.3 numerics note).
# Benchmark paths may pass precision=DEFAULT for bf16 speed.
_PRECISION = jax.lax.Precision.HIGHEST


def _tie_break(scores: Array) -> Array:
    """Bias scores so equal scores order by ascending corpus index (FAISS
    returns the lower index first for exact ties).

    Precision bound: the bias at row i is i*1e-12, so scores closer than
    that can be mis-ordered. The engine only uses this full-width form
    below STREAMING_THRESHOLD (262144 rows -> bias <= 2.6e-7, ~4 f32 ulps
    at score 1.0); larger corpora go through ``dense_topk_chunked``, whose
    bias is block-LOCAL and whose cross-block merge is exactly
    lexicographic (``lex_topk``), matching the distributed merge."""
    n = scores.shape[-1]
    iota = jnp.arange(n, dtype=scores.dtype)
    return scores - iota * jnp.asarray(1e-12, scores.dtype)


def lex_topk(scores: Array, idx: Array, k: int) -> Tuple[Array, Array]:
    """Top-k by (score desc, index asc) — EXACT tie-break via two-key
    lexicographic lax.sort. The single source of stable candidate merging:
    dense_topk_chunked's cross-block merge and parallel.mesh's cross-shard
    merge both use it, so their orderings agree at any scale."""
    neg = -scores
    sorted_neg, sorted_idx = jax.lax.sort((neg, idx), num_keys=2)
    return -sorted_neg[..., :k], sorted_idx[..., :k]


@functools.partial(jax.jit, static_argnames=("k", "exact"))
def dense_topk(
    corpus: Array, queries: Array, k: int, exact: bool = True
) -> Tuple[Array, Array]:
    """Exact top-k inner-product search.

    Args:
      corpus: [N, D] L2-normalized embedding matrix (HBM-resident).
      queries: [Q, D] L2-normalized query batch (original + HyDE rewrites
        batched in one launch, vs the reference's per-query FAISS calls).
      k: neighbors to return (clamped to N).
      exact: use ``lax.top_k`` (bit-exact ordering). When False, uses
        ``lax.approx_max_k``, the TPU-optimized approximate top-k.

    Returns:
      (scores [Q, k], indices [Q, k]) sorted descending by score.
    """
    n = corpus.shape[0]
    k = min(k, n)
    scores = jnp.matmul(
        queries, corpus.T, precision=_PRECISION,
        preferred_element_type=jnp.float32,
    ).astype(jnp.float32)
    if exact:
        top_scores, top_idx = jax.lax.top_k(_tie_break(scores), k)
    else:
        top_scores, top_idx = jax.lax.approx_max_k(scores, k)
    # Return true (un-biased) scores at the selected indices.
    true_scores = jnp.take_along_axis(scores, top_idx, axis=-1)
    return true_scores, top_idx


@functools.partial(jax.jit, static_argnames=("k", "block"))
def dense_topk_chunked(
    corpus: Array, queries: Array, k: int, block: int = 65536
) -> Tuple[Array, Array]:
    """Top-k without materializing the full [Q, N] score matrix.

    Scans corpus blocks with ``lax.scan``, merging a running top-k buffer —
    O(Q*k) live memory regardless of N. HBM traffic is exactly one pass over
    the corpus (the bandwidth-optimal schedule for exact search).
    """
    n, d = corpus.shape
    q = queries.shape[0]
    k = min(k, n)
    num_blocks = -(-n // block)
    pad = num_blocks * block - n
    if pad:
        corpus = jnp.pad(corpus, ((0, pad), (0, 0)))
    blocks = corpus.reshape(num_blocks, block, d)

    neg = jnp.float32(-jnp.inf)
    init_scores = jnp.full((q, k), neg, jnp.float32)
    init_idx = jnp.full((q, k), n, jnp.int32)

    local_k = min(k, block)

    def step(carry, inputs):
        best_s, best_i = carry
        blk, blk_start = inputs
        s = jnp.matmul(queries, blk.T, precision=_PRECISION,
                       preferred_element_type=jnp.float32)
        idx = blk_start + jnp.arange(block, dtype=jnp.int32)
        valid = idx < n
        s = jnp.where(valid[None, :], s, neg)
        # block-LOCAL index bias (<= block*1e-12 = 6.6e-8, one f32 ulp at
        # score 1.0 — a GLOBAL bias would reach 1e-5 at 10M rows and
        # reorder genuinely different scores), then an EXACT lexicographic
        # merge with the running buffer
        biased = s - jnp.arange(block, dtype=jnp.float32)[None, :] * 1e-12
        _, sel = jax.lax.top_k(biased, local_k)
        blk_s = jnp.take_along_axis(s, sel, axis=1)
        blk_i = jnp.take_along_axis(
            jnp.broadcast_to(idx, (q, block)), sel, axis=1)
        cat_s = jnp.concatenate([best_s, blk_s], axis=1)
        cat_i = jnp.concatenate([best_i, blk_i], axis=1)
        return lex_topk(cat_s, cat_i, k), None

    starts = jnp.arange(num_blocks, dtype=jnp.int32) * block
    (best_s, best_i), _ = jax.lax.scan(step, (init_scores, init_idx), (blocks, starts))
    return best_s, best_i


def dense_topk_large(corpus: Array, queries: Array, k: int,
                     block: int = 65536) -> Tuple[Array, Array]:
    """Large-corpus exact top-k router (the FAISS IndexFlatIP equivalent at
    scale, reference faissRetriever.py:18-37).

    fp32 corpus -> the streaming XLA kernel (``dense_topk_chunked``, exact
    FAISS parity). bf16 corpus on a real TPU -> the fused Pallas
    matmul+top-k MIPS kernel (ops/pallas_mips.py): the [Q, N] score matrix
    never exists in HBM and the corpus is read once at bf16 width — half
    the HBM traffic of the fp32 path (2.0 ms vs 3.4-5.9 ms at 1M x 384 on
    v5e, module docstring there). bf16 off-TPU (tests, CPU meshes) falls
    back to the chunked kernel on the bf16 operand.

    Numerics: queries are cast to the corpus dtype, so every path computes
    f32-accumulated products of IDENTICAL bf16 inputs (a bf16 x bf16
    product is exact in f32) — orderings agree across paths up to
    accumulation-order ulps, and ties break FAISS-style (index asc) in
    both kernels.
    """
    q = queries.astype(corpus.dtype)
    if (corpus.dtype == jnp.bfloat16 and k <= 1024
            and jax.default_backend() == "tpu"):
        from .pallas_mips import pallas_mips_topk

        return pallas_mips_topk(corpus, q, k)
    return dense_topk_chunked(corpus, q, k, block=block)


def rank_from_scores(scores: Array, cand_s: Array, block: int = 65536,
                     tol: float = 1e-6) -> Array:
    """rank[q, c] = #{j : scores[q, j] > cand_s[q, c] + tol}, streamed over
    score blocks — O(Q*block*C) live memory instead of the O(Q*N*C)
    broadcast. The ONE greater-count kernel: the single-chip fused search
    and the sharded search (per-shard counts + psum) both call it, so the
    depth-cutoff tolerance and blocking can never drift between them.
    ``rank_of`` (below) is the from-corpus variant that recomputes scores
    block-by-block when [Q, N] is never materialized at all."""
    q, n = scores.shape
    if n <= block:
        return (scores[:, :, None] > cand_s[:, None, :] + tol).sum(
            axis=1).astype(jnp.int32)
    nb = -(-n // block)
    pad = nb * block - n
    padded = jnp.pad(scores, ((0, 0), (0, pad)),
                     constant_values=-jnp.inf) if pad else scores
    blocks = jnp.moveaxis(padded.reshape(q, nb, block), 1, 0)

    def step(carry, blk):
        gt = blk[:, :, None] > cand_s[:, None, :] + tol
        return carry + gt.sum(axis=1).astype(jnp.int32), None

    init = jnp.zeros(cand_s.shape, jnp.int32)
    ranks, _ = jax.lax.scan(step, init, blocks)
    return ranks


@jax.jit
def scores_at(corpus: Array, queries: Array, idx: Array) -> Array:
    """Exact scores of specific corpus rows: [Q, C] for idx [Q, C].

    Replaces the reference's ``effective_ids`` dict lookups for neighbor
    expansion (ensembleRetriever.py:68,93,102) with a gather + batched dot.
    """
    gathered = corpus[idx]              # [Q, C, D]
    return jnp.einsum(
        "qd,qcd->qc", queries, gathered, precision=_PRECISION,
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("block",))
def rank_of(
    corpus: Array,
    queries: Array,
    cand_scores: Array,
    block: int = 65536,
    tol: float = 1e-6,
) -> Array:
    """Rank (0-based) each candidate score would hold in the full corpus
    ordering for its query: rank = #{j : score_j > s + tol}.

    Gives an exact "within depth-2048" test (reference semantics: a neighbor
    outside the search depth contributes score 0, ensembleRetriever.py:68)
    without materializing a 2048-wide sorted list. One streaming pass over
    the corpus; O(Q*C) live memory. ``tol`` absorbs last-ulp differences
    between the candidate scores (computed by scores_at's einsum) and this
    kernel's matmul — cosine scores live in [-1, 1] so an absolute 1e-6 is
    far below any meaningful score gap.
    """
    n, d = corpus.shape
    num_blocks = -(-n // block)
    pad = num_blocks * block - n
    padded = jnp.pad(corpus, ((0, pad), (0, 0))) if pad else corpus
    blocks = padded.reshape(num_blocks, block, d)

    def step(carry, inputs):
        blk, blk_start = inputs
        s = jnp.matmul(queries, blk.T, precision=_PRECISION,
                       preferred_element_type=jnp.float32)
        idx = blk_start + jnp.arange(block, dtype=jnp.int32)
        valid = (idx < n)[None, :, None]
        gt = (s[:, :, None] > cand_scores[:, None, :] + tol) & valid
        return carry + gt.sum(axis=1).astype(jnp.int32), None

    starts = jnp.arange(num_blocks, dtype=jnp.int32) * block
    init = jnp.zeros(cand_scores.shape, jnp.int32)
    ranks, _ = jax.lax.scan(step, init, (blocks, starts))
    return ranks
