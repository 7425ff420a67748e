"""Short-sequence multi-head attention as a single Pallas kernel.

Why: the cross-encoder rerank forward is the latency hot spot of the fused
serve path, and XLA's attention materializes the [B, H, S, S] score matrix
in HBM — at B=50, H=12, S=256 that is ~470 MB of f32/bf16 traffic per layer
(~7 ms across 12 layers at v5e HBM bandwidth), pure overhead for S<=512
where the whole score tile fits in VMEM. This kernel computes
scores -> mask -> softmax -> context per (batch, head) program entirely in
VMEM; HBM sees only q/k/v reads and the context write.

Not a flash-attention variant: the Pallas flash kernel
(jax.experimental.pallas.ops.tpu.flash_attention) is tiled for long
sequences and measured ~1.7x SLOWER than plain XLA at this shape; for
S<=512 the untiled whole-row softmax is the right schedule.

Numerics match jax.nn.softmax in f32 (max-subtracted, f32 accumulation);
key padding is masked with -1e30 like the XLA path in models/encoder.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mha_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, *, scale, heads):
    """One program per batch row; all heads computed in-kernel so the grid
    stays small (the TensorCore runs grid programs sequentially — per-
    program overhead dominates with a (B, H) grid)."""
    seq = q_ref.shape[2]
    col = jax.lax.broadcasted_iota(jnp.int32, (seq, seq), 1)
    valid_len = len_ref[pl.program_id(0)]
    keymask = col < valid_len
    for h in range(heads):                          # static unroll
        q = q_ref[0, h].astype(jnp.float32)         # [S, D]
        k = k_ref[0, h].astype(jnp.float32)
        v = v_ref[0, h]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # [S, S]
        s = jnp.where(keymask, s, -1e30)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[0, h] = jnp.dot(p.astype(v.dtype), v,
                              preferred_element_type=jnp.float32
                              ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def short_seq_mha(q, k, v, lengths, interpret: bool = False):
    """Masked MHA for S <= ~512: softmax(q k^T / sqrt(D) + keymask) v.

    Args:
      q, k, v: [B, H, S, D] (bf16 or f32).
      lengths: [B] int32 — number of valid (unpadded) key positions per row.
      interpret: run the Pallas interpreter (CPU tests).

    Returns [B, H, S, D] in q.dtype. Rows at padded QUERY positions receive
    the same values the XLA path produces (keys are masked, queries are
    not) — downstream pooling reads only valid positions.
    """
    b, h, s, d = q.shape
    scale = 1.0 / math.sqrt(d)
    spec = pl.BlockSpec((1, h, s, d), lambda i: (i, 0, 0, 0),
                        memory_space=pl.ANY if interpret else pltpu.VMEM)
    # whole lengths vector in SMEM (rank-1 blocks must cover the array)
    len_spec = pl.BlockSpec((b,), lambda i: (0,),
                            memory_space=pltpu.SMEM)
    return pl.pallas_call(
        functools.partial(_mha_kernel, scale=scale, heads=h),
        grid=(b,),
        in_specs=[len_spec, spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
        interpret=interpret,
    )(lengths, q, k, v)


def mha_reference(q, k, v, lengths):
    """XLA reference for tests: same mask/softmax semantics."""
    scale = 1.0 / math.sqrt(q.shape[-1])
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    seq = q.shape[2]
    col = jnp.arange(seq)[None, None, None, :]
    s = jnp.where(col < lengths[:, None, None, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)
