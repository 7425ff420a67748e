"""Device mesh construction and ICI-sharded retrieval collectives.

The reference has no first-party distributed layer at all — its only
multi-device constructs are per-GPU process pools (reference:
experiments/retriever/step3_mul.py:406-431) and torchrun with one process
(train_bge_rr.sh:7). This module is the TPU-native first-class equivalent
(SURVEY.md §5.8): a mesh over ICI (intra-slice) / DCN (multi-slice), the
corpus embedding matrix sharded over a 'corpus' axis, and a distributed
exact top-k whose results are bit-identical to the single-shard kernel.

Collective design: per-shard matmul + local top-k (each shard streams only
its rows from HBM), then one small all_gather of [shards, Q, k] candidates
over ICI and a lexicographic (score desc, index asc) merge — the all_gather
payload is k candidates per shard, not corpus rows, so ICI traffic is
O(shards * Q * k), independent of corpus size.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: Sequence[Tuple[str, int]],
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a Mesh from ordered (axis, size) pairs; sizes must multiply to
    the device count (use -1 once for 'remaining devices')."""
    devices = list(devices if devices is not None else jax.devices())
    names = [a for a, _ in axis_sizes]
    sizes = [s for _, s in axis_sizes]
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = len(devices) // known
    if int(np.prod(sizes)) != len(devices):
        raise ValueError(f"mesh {dict(zip(names, sizes))} != {len(devices)} devices")
    mesh_devices = np.asarray(devices).reshape(sizes)
    return Mesh(mesh_devices, tuple(names))


def _axis_size(mesh: Mesh, axis) -> int:
    """Total shard count over one axis name or a tuple of names (a tuple
    spans multiple mesh axes — e.g. ('dcn', 'corpus') for a multi-host
    corpus sharded across slices and across chips within a slice)."""
    if isinstance(axis, (tuple, list)):
        return int(np.prod([mesh.shape[a] for a in axis]))
    return mesh.shape[axis]


def _axis_linear_index(mesh: Mesh, axis):
    """Linearized shard index for one axis name or a tuple (first axis
    major — matches PartitionSpec tuple-entry row placement)."""
    if isinstance(axis, (tuple, list)):
        idx = jax.lax.axis_index(axis[0])
        for a in axis[1:]:
            idx = idx * mesh.shape[a] + jax.lax.axis_index(a)
        return idx
    return jax.lax.axis_index(axis)


def _as_spec_entry(axis):
    return tuple(axis) if isinstance(axis, (tuple, list)) else axis


def corpus_sharding(mesh: Mesh, axis="corpus") -> NamedSharding:
    return NamedSharding(mesh, P(_as_spec_entry(axis), None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_corpus(embeddings: np.ndarray, mesh: Mesh,
                 axis="corpus") -> Tuple[jax.Array, int]:
    """Pad the corpus to a multiple of the axis size and place shards across
    devices. Returns (sharded array, original row count). Pad rows are
    zero vectors — score 0 against any normalized query, and the merge
    masks them out by index. ``axis`` may be a tuple of mesh axes (e.g.
    ('dcn', 'corpus') for multi-host + ICI sharding)."""
    shards = _axis_size(mesh, axis)
    n = embeddings.shape[0]
    padded_n = -(-n // shards) * shards
    if padded_n != n:
        embeddings = np.concatenate(
            [embeddings,
             np.zeros((padded_n - n, embeddings.shape[1]), embeddings.dtype)],
            axis=0)
    arr = jax.device_put(embeddings, corpus_sharding(mesh, axis))
    return arr, n


# exact (score desc, index asc) top-k shared with the chunked single-chip
# kernel, so distributed merges are bit-identical to single-shard ordering
# (SURVEY.md §7.3 'stable ordering' requirement)
from ..ops.topk import lex_topk as _lex_topk  # noqa: E402


@functools.partial(jax.jit, static_argnames=("k", "axis", "mesh", "valid_n"))
def _distributed_topk_impl(corpus, queries, k, mesh, axis, valid_n):
    shards = _axis_size(mesh, axis)
    per_shard = corpus.shape[0] // shards
    local_k = min(k, per_shard)   # a shard can hold fewer rows than k

    def local(corpus_shard, q):
        s = jnp.matmul(q.astype(corpus_shard.dtype), corpus_shard.T,
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
        offset = _axis_linear_index(mesh, axis) * per_shard
        local_idx = jnp.arange(per_shard, dtype=jnp.int32) + offset
        # mask pad rows (global index >= valid_n)
        s = jnp.where(local_idx[None, :] < valid_n, s, -jnp.inf)
        ls, li = _lex_topk(s, jnp.broadcast_to(local_idx, s.shape), local_k)
        # gather all shards' candidates: [shards, Q, local_k]
        gather_axis = tuple(axis) if isinstance(axis, (tuple, list)) else axis
        all_s = jax.lax.all_gather(ls, gather_axis)
        all_i = jax.lax.all_gather(li, gather_axis)
        all_s = all_s.reshape(shards, *ls.shape)
        all_i = all_i.reshape(shards, *li.shape)
        q_n = q.shape[0]
        cat_s = jnp.transpose(all_s, (1, 0, 2)).reshape(q_n, shards * local_k)
        cat_i = jnp.transpose(all_i, (1, 0, 2)).reshape(q_n, shards * local_k)
        return _lex_topk(cat_s, cat_i, k)

    # outputs are replicated by construction (identical all_gather + merge on
    # every shard) but VMA inference can't prove it, hence check_vma=False
    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(_as_spec_entry(axis), None), P(None, None)),
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )(corpus, queries)


def distributed_topk(corpus_sharded: jax.Array, queries: jax.Array, k: int,
                     mesh: Mesh, valid_n: int, axis="corpus"
                     ) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k over an ICI-sharded corpus; ordering bit-identical to the
    single-device kernel (score desc, index asc)."""
    k = min(k, valid_n)
    if isinstance(axis, list):
        axis = tuple(axis)
    return _distributed_topk_impl(corpus_sharded, queries, k, mesh, axis,
                                  valid_n)


@functools.partial(
    jax.jit,
    static_argnames=("k", "ts_k", "steps", "depth", "expand", "mesh",
                     "axis", "valid_n"))
def distributed_fused_search(corpus_sharded, ts_emb, q_emb, prev_idx,
                             next_idx, k, ts_k, steps, depth, expand,
                             mesh, valid_n, axis="corpus", ts_rows=None):
    """The ensemble engine's fused multi-path search over an ICI-sharded
    corpus — one shard_map dispatch for: dense top-k with cross-shard merge,
    title top-k (replicated — the title matrix is tiny), and neighbor-chain
    scores + depth-cutoff ranks assembled with psums. Mirrors
    retrieval.ensemble._search_body semantics exactly, so the host fusion
    loop is shard-count agnostic (BASELINE config #5: ICI-sharded 10M-chunk
    corpus).

    ``ts_rows``: optional int32 [R] rows of q_emb that are request
    originals — the micro-batched ``invoke_batch`` shape, where the title
    path runs once per request instead of once (q_emb row 0)."""
    shards = _axis_size(mesh, axis)
    per_shard = corpus_sharded.shape[0] // shards
    # clamp like distributed_topk's wrapper: k > valid_n would return pad
    # rows (score -inf) whose indices poison downstream metadata gathers
    k = min(k, valid_n)
    ts_k = min(ts_k, ts_emb.shape[0])
    local_k = min(k, per_shard)
    multi_request = ts_rows is not None

    def local(corpus_shard, ts, q, prev, nxt, *maybe_ts_rows):
        qn = q.shape[0]
        # bf16-stored corpora (retrieval.corpus_dtype) score bf16-cast
        # queries — identical products to the single-chip bf16 path; the
        # title matmul below keeps the fp32 queries (ts stays fp32)
        q_c = q.astype(corpus_shard.dtype)
        s = jnp.matmul(q_c, corpus_shard.T,
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)     # [Q, per]
        offset = _axis_linear_index(mesh, axis) * per_shard
        idx_global = jnp.arange(per_shard, dtype=jnp.int32) + offset
        s_valid = jnp.where(idx_global[None, :] < valid_n, s, -jnp.inf)

        # dense top-k: local + all-gather merge
        ls, li = _lex_topk(s_valid, jnp.broadcast_to(idx_global, s.shape),
                           local_k)
        gax = tuple(axis) if isinstance(axis, (tuple, list)) else axis
        all_s = jax.lax.all_gather(ls, gax).reshape(shards, *ls.shape)
        all_i = jax.lax.all_gather(li, gax).reshape(shards, *li.shape)
        cat_s = jnp.transpose(all_s, (1, 0, 2)).reshape(qn, shards * local_k)
        cat_i = jnp.transpose(all_i, (1, 0, 2)).reshape(qn, shards * local_k)
        top_s, top_i = _lex_topk(cat_s, cat_i, k)

        # title path (replicated small matmul); one row per request when
        # ts_rows is provided (invoke_batch), else q row 0
        ts_q = q[maybe_ts_rows[0]] if multi_request else q[:1]
        ts_scores = jnp.matmul(ts_q, ts.T,
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)
        neg_ts, ts_i = jax.lax.sort(
            (-ts_scores, jnp.broadcast_to(
                jnp.arange(ts.shape[0], dtype=jnp.int32), ts_scores.shape)),
            num_keys=1)
        ts_s = -neg_ts[:, :ts_k]
        ts_i = ts_i[:, :ts_k]
        if not multi_request:
            ts_s, ts_i = ts_s[0], ts_i[0]

        if not expand or steps <= 0:
            # width-0 like ensemble._search_body — a width-1 zero sentinel
            # would collide with a real neighbor whose score is exactly 0
            zero_i = jnp.zeros((qn, 0), jnp.int32)
            zero_s = jnp.zeros((qn, 0), jnp.float32)
            return top_s, top_i, ts_s, ts_i, zero_i, zero_s

        # neighbor chains from the replicated prev/next arrays
        def walk(table):
            outs = []
            cur = top_i
            for _ in range(steps):
                nxt_i = table[jnp.maximum(cur, 0)]
                cur = jnp.where(cur >= 0, nxt_i, -1)
                outs.append(cur)
            return jnp.concatenate(outs, axis=-1)

        cand = jnp.concatenate([walk(prev), walk(nxt)], axis=-1)
        safe = jnp.maximum(cand, 0)
        # each shard contributes the scores of candidates in its range
        local_pos = jnp.clip(safe - offset, 0, per_shard - 1)
        in_range = (safe >= offset) & (safe < offset + per_shard)
        cs_local = jnp.take_along_axis(s, local_pos, axis=1)
        pax = tuple(axis) if isinstance(axis, (tuple, list)) else axis
        cand_s = jax.lax.psum(jnp.where(in_range, cs_local, 0.0), pax)
        # depth cutoff: global rank = psum of per-shard greater-counts,
        # STREAMED over score blocks by the shared kernel — the naive
        # [Q, per_shard, C] bool broadcast is ~1.2 GB/shard at config-#5
        # scale (invalid rows are already -inf in s_valid, so they can
        # never count as greater)
        from ..ops.topk import rank_from_scores

        rank = jax.lax.psum(rank_from_scores(s_valid, cand_s), pax)
        eff = jnp.where((cand >= 0) & (rank < depth), cand_s, 0.0)
        return top_s, top_i, ts_s, ts_i, cand, eff

    ts_spec = P(None, None) if multi_request else P(None)
    in_specs = [P(_as_spec_entry(axis), None), P(None, None), P(None, None),
                P(None), P(None)]
    operands = [corpus_sharded, ts_emb, q_emb, prev_idx, next_idx]
    if multi_request:
        in_specs.append(P(None))
        operands.append(ts_rows)
    return jax.shard_map(
        local, mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(None, None), P(None, None), ts_spec, ts_spec,
                   P(None, None), P(None, None)),
        check_vma=False,
    )(*operands)
