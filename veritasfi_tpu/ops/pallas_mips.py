"""Fused Pallas matmul + top-k MIPS kernel.

The TPU-native replacement for FAISS exact search at corpus scale
(reference: faissRetriever.py:18-37): streams the corpus through VMEM in
blocks (Mosaic pipelines the HBM->VMEM fetches), computes the query-block
score tile on the MXU, and maintains a running exact top-k per query in
VMEM scratch — the [Q, N] score matrix never exists in HBM, so the kernel
runs at HBM-bandwidth speed-of-light for exact search (one pass over the
corpus) with O(Q*k) state.

Merge strategy: Mosaic has no sort/top_k primitive. The running [Q, k]
buffer is kept SORTED descending; per corpus block, a while_loop pops only
the candidates that actually beat their query's current k-th best
(typically 1-2 per contributing block, thanks to the block-skip test) and
insertion-sorts each into the buffer with a roll-shift — extraction cost is
O(#improving candidates) VPU passes, not O(k) fixed sweeps.

Tie-break: extraction picks the first (lowest-column) maximum explicitly
(Mosaic's argmax does not guarantee first-match on ties), and the running
buffer (earlier blocks = lower indices) precedes the block candidates in
the merge tile, so equal scores order by ascending corpus index —
bit-identical to ``ops.topk.dense_topk`` and FAISS.

The extraction only runs on blocks that can actually displace the running
k-th best (a strict-greater test — exact under FAISS tie rules, since a
later-block tie always loses to the buffered lower index), so after the
first blocks the kernel is matmul/HBM-bound.

Measured on one v5e chip (N=1M, D=384, Q=8, K=16; device compute after
subtracting the ~28 ms relay round-trip): pallas bf16 2.0 ms (vs its
0.95 ms k=1 HBM+matmul floor), pallas fp32 5.0 ms (fp32 MXU multipass),
XLA chunked fp32 3.4-5.9 ms across runs. The bf16 kernel beats XLA
chunked outright; the engine's default stays the fp32 XLA path because
recall parity with fp32 FAISS requires fp32 scores (SURVEY §7.3) — the
kernel is the speed/memory option for bf16-resident corpora.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -3.4e38  # plain float so the kernel doesn't capture a traced constant


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

    # skip the merge whenever this block cannot contribute: the buffer is
    # kept sorted descending, so column k-1 is each query's current k-th
    # best. After the first blocks almost every block is skipped
    # (P[block contributes] ~ Q*k/blocks_seen), leaving the kernel
    # matmul/HBM-bound.
    block_max = jnp.max(s, axis=1)            # [Q]
    kth = best_s[:, k - 1]
    could_contribute = jnp.any(block_max > kth)

    @pl.when(could_contribute)
    def _merge():
        # INSERTION merge: extract only candidates that actually beat their
        # query's k-th best (typically 1-2 per contributing block), not a
        # fixed 2k sweeps. Each iteration pops the per-query max and
        # insertion-sorts it into the [Q, k] buffer with a roll-shift —
        # O(#improving candidates) VPU passes per block instead of O(k).
        q = s.shape[0]
        width = s.shape[1]
        col_w = jax.lax.broadcasted_iota(jnp.int32, (q, width), 1)
        col_k = jax.lax.broadcasted_iota(jnp.int32, (q, k), 1)

        def cond(carry):
            sc, bs, bi = carry
            return jnp.any(jnp.max(sc, axis=1) > bs[:, k - 1])

        def body(carry):
            sc, bs, bi = carry
            m = jnp.max(sc, axis=1)                       # [Q]
            # first (lowest-column) max — FAISS ascending-index tie order
            is_max = sc >= m[:, None]
            am = jnp.min(jnp.where(is_max, col_w, 2_147_483_647), axis=1)
            onehot = col_w == am[:, None]
            picked = jnp.sum(jnp.where(onehot, corpus_idx, 0), axis=1)
            sc = jnp.where(onehot, NEG, sc)
            # insert after all buffer entries with score >= m (buffer
            # entries carry lower corpus indices — earlier blocks/columns)
            ins = m > bs[:, k - 1]                        # [Q]
            pos = jnp.sum((bs >= m[:, None]).astype(jnp.int32), axis=1)
            rolled_s = pltpu.roll(bs, 1, axis=1)
            rolled_i = pltpu.roll(bi, 1, axis=1)
            new_s = jnp.where(col_k < pos[:, None], bs,
                              jnp.where(col_k == pos[:, None], m[:, None],
                                        rolled_s))
            new_i = jnp.where(col_k < pos[:, None], bi,
                              jnp.where(col_k == pos[:, None],
                                        picked[:, None], rolled_i))
            bs = jnp.where(ins[:, None], new_s, bs)
            bi = jnp.where(ins[:, None], new_i, bi)
            return sc, bs, bi

        _, new_bs, new_bi = jax.lax.while_loop(
            cond, body, (s, best_s[:], best_i[:]))
        best_s[:] = new_bs
        best_i[:] = new_bi

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
