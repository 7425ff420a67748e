"""Fused Pallas matmul + top-k MIPS kernel.

The TPU-native replacement for FAISS exact search at corpus scale
(reference: faissRetriever.py:18-37): streams the corpus through VMEM in
blocks (Mosaic pipelines the HBM->VMEM fetches), computes the query-block
score tile on the MXU, and maintains a running exact top-k per query in
VMEM scratch — the [Q, N] score matrix never exists in HBM, so the kernel
runs at HBM-bandwidth speed-of-light for exact search (one pass over the
corpus) with O(Q*k) state.

Merge strategy: Mosaic has no sort/top_k primitive, so each block's top-k is
extracted by k iterated (max, argmax, mask) sweeps — exact, because every
global top-k element is inside its own block's top-k. The block candidates
are then merged with the running buffer by another k sweeps over a [Q, 2k]
tile. Extraction cost is ~k VPU passes per block against D MAC columns of
MXU work, so for k <= 64 and D >= 256 the kernel stays memory-bound.

Tie-break: extraction picks the first (lowest-column) maximum explicitly
(Mosaic's argmax does not guarantee first-match on ties), and the running
buffer (earlier blocks = lower indices) precedes the block candidates in
the merge tile, so equal scores order by ascending corpus index —
bit-identical to ``ops.topk.dense_topk`` and FAISS.

The extraction only runs on blocks that can actually displace the running
k-th best (a strict-greater test — exact under FAISS tie rules, since a
later-block tie always loses to the buffered lower index), so after the
first blocks the kernel is matmul/HBM-bound.

Measured on one v5e chip (N=1M, D=384, Q=8, K=16, through the axon relay
whose dispatch RTT is ~25-30 ms): pallas fp32 37 ms / bf16 36 ms vs XLA
full-materialize 33 ms and XLA chunked 35 ms — all within noise of the
RTT + HBM floor. The engine defaults to the XLA path at bench scales; this
kernel is the O(Q*k)-memory variant for corpora where the [Q, N] score
buffer (or an fp32 corpus copy) doesn't fit alongside serving state.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -3.4e38  # plain float so the kernel doesn't capture a traced constant


def _extract_topk(scores, idx_of, k: int):
    """k iterated (max, argmax, mask) sweeps, fully in registers.

    ``idx_of`` maps score columns to corpus indices ([Q, width] int32).
    Returns (vals [Q, k], idxs [Q, k]) descending, first-max (lowest index)
    tie order. Column writes use masked selects, not dynamic lane stores
    (Mosaic requires 128-aligned lane slicing).
    """
    q, width = scores.shape
    col_w = jax.lax.broadcasted_iota(jnp.int32, (q, width), 1)
    col_k = jax.lax.broadcasted_iota(jnp.int32, (q, k), 1)
    vals0 = jnp.full((q, k), NEG, jnp.float32)
    idxs0 = jnp.full((q, k), 2_147_483_647, jnp.int32)

    def body(j, carry):
        s, vals, idxs = carry
        m = jnp.max(s, axis=1)
        # first-max column (Mosaic argmax does not guarantee first-match on
        # ties, which would break FAISS ascending-index tie order)
        is_max = s >= m[:, None]
        am = jnp.min(jnp.where(is_max, col_w, 2_147_483_647), axis=1)
        onehot = col_w == am[:, None]
        picked = jnp.sum(jnp.where(onehot, idx_of, 0), axis=1)
        vals = jnp.where(col_k == j, m[:, None], vals)
        idxs = jnp.where(col_k == j, picked[:, None], idxs)
        return jnp.where(onehot, NEG, s), vals, idxs

    _, vals, idxs = jax.lax.fori_loop(0, k, body, (scores, vals0, idxs0))
    return vals, idxs


def _mips_kernel(n_ref, q_ref, blk_ref, out_s_ref, out_i_ref,
                 best_s, best_i, *, k: int, block: int):
    step = pl.program_id(0)
    num_steps = pl.num_programs(0)

    @pl.when(step == 0)
    def _init():
        best_s[:] = jnp.full(best_s.shape, NEG, jnp.float32)
        best_i[:] = jnp.full(best_i.shape, 2_147_483_647, jnp.int32)

    # MXU: scores for this corpus block. fp32 inputs use multi-pass fp32 MXU
    # (FAISS parity); bf16 inputs take the single-pass fast path (Mosaic
    # rejects HIGHEST on bf16 operands).
    precision = (jax.lax.Precision.HIGHEST
                 if blk_ref.dtype == jnp.float32 else
                 jax.lax.Precision.DEFAULT)
    s = jnp.dot(q_ref[:], blk_ref[:].T, precision=precision,
                preferred_element_type=jnp.float32)
    base = step * block
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    corpus_idx = col + base
    s = jnp.where(corpus_idx < n_ref[0], s, NEG)

    # skip the O(k)-sweep extraction whenever this block cannot contribute:
    # extraction wrote best_s in descending order, so column k-1 is each
    # query's current k-th best. After the first few blocks almost every
    # block is skipped (P[block contributes] ~ Q*k*block/N_seen), leaving
    # the kernel matmul/HBM-bound.
    block_max = jnp.max(s, axis=1)            # [Q]
    kth = best_s[:, k - 1]
    could_contribute = jnp.any(block_max > kth)

    @pl.when(could_contribute)
    def _merge():
        cand_s, cand_i = _extract_topk(s, corpus_idx, k)
        # merge with running buffer (buffer first => lower index wins ties)
        m_s = jnp.concatenate([best_s[:], cand_s], axis=1)
        m_i = jnp.concatenate([best_i[:], cand_i], axis=1)
        new_s, new_i = _extract_topk(m_s, m_i, k)
        best_s[:] = new_s
        best_i[:] = new_i

    @pl.when(step == num_steps - 1)
    def _finalize():
        out_s_ref[:] = best_s[:]
        out_i_ref[:] = best_i[:]


@functools.partial(jax.jit, static_argnames=("k", "block"))
def pallas_mips_topk(corpus: jax.Array, queries: jax.Array, k: int,
                     block: int = 1024) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k inner-product search, fused matmul + merge.

    Args:
      corpus: [N, D] embedding matrix (fp32 or bf16), HBM-resident.
      queries: [Q, D] query batch.
      k: neighbors (<= block).
    Returns:
      (scores [Q, k], indices [Q, k]) descending, FAISS tie order.
    """
    n, d = corpus.shape
    q = queries.shape[0]
    if k > block:
        raise ValueError(f"k={k} must be <= block={block}")
    k_eff = min(k, n)

    # pad shapes to hardware tiles
    q_pad = -q % 8
    if q_pad:
        queries = jnp.pad(queries, ((0, q_pad), (0, 0)))
    n_pad = -n % block
    if n_pad:
        corpus = jnp.pad(corpus, ((0, n_pad), (0, 0)))
    num_blocks = corpus.shape[0] // block
    qp = queries.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((qp, d), lambda i, n_ref: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, d), lambda i, n_ref: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((qp, k), lambda i, n_ref: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qp, k), lambda i, n_ref: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((qp, k), jnp.float32),   # best_s
            pltpu.VMEM((qp, k), jnp.int32),     # best_i
        ],
    )
    kernel = functools.partial(_mips_kernel, k=k, block=block)
    out_s, out_i = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((qp, k), jnp.float32),
            jax.ShapeDtypeStruct((qp, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * qp * corpus.shape[0] * d,
            bytes_accessed=corpus.shape[0] * d * corpus.dtype.itemsize,
            transcendentals=0,
        ),
    )(jnp.asarray([n], jnp.int32), queries.astype(corpus.dtype), corpus)
    return out_s[:q, :k_eff], out_i[:q, :k_eff]
