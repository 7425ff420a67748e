"""Dynamic int8 matmul (Pallas): quantize -> int8 MXU GEMM -> fused dequant.

v5e's MXU runs int8 x int8 -> int32 at ~2x its bf16 rate; XLA's int8
dot_general does not hit that path (measured 1.00x in r1), but a Pallas
kernel with an explicit int8 dot does: 256 T/s vs 174 T/s bf16 measured at
rerank shapes ([9728, 768] x [768, 768]). This module wraps it as a
drop-in dynamic-quantization matmul:

  s_a[i] = max|a[i, :]| / 127        (per activation row)
  s_w[j] = max|w[:, j]| / 127        (per output column)
  out    = (round(a/s_a) @ round(w/s_w)) * s_a * s_w  (+ bias)

Error is ~1e-2 relative on O(1) activations — acceptable for the serving
rerank forward (scores feed an argsort; the perf arch documents the
numerics delta, parity tests keep the exact default path).

STATUS: with per-call dynamic weight quantization the end-to-end rerank
forward measures a wash (14.7 vs 15.1 ms at [50,192]) — the quant passes
eat the GEMM saving. The kernel itself delivers 1.47x on pre-quantized
inputs; the win requires weights quantized ONCE at load (int8 kernel +
scale in the param tree) with only the activation quant left per call —
the round-3 follow-up. mlp_impl="int8" is therefore not the default
anywhere yet.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(a_ref, w_ref, sa_ref, sw_ref, o_ref):
    acc = jax.lax.dot_general(
        a_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    o_ref[:] = (acc.astype(jnp.float32)
                * sa_ref[:] * sw_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("block_m", "block_n", "interpret"))
def dynamic_int8_matmul(a, w, bias=None, block_m: int = 512,
                        block_n: int = 256, interpret: bool = False):
    """a [M, K] (bf16/f32) @ w [K, N] with dynamic int8 quantization.

    Returns [M, N] in a.dtype. K must be a multiple of 128 for clean MXU
    tiles (true for all transformer hidden sizes here); M and N are padded
    internally.
    """
    m, k = a.shape
    k2, n = w.shape
    out_dtype = a.dtype

    # dynamic quantization (XLA; one pass over a and w)
    af = a.astype(jnp.float32)
    wf = w.astype(jnp.float32)
    sa = jnp.maximum(jnp.max(jnp.abs(af), axis=1, keepdims=True),
                     1e-6) / 127.0                      # [M, 1]
    sw = jnp.maximum(jnp.max(jnp.abs(wf), axis=0, keepdims=True),
                     1e-6) / 127.0                      # [1, N]
    a8 = jnp.clip(jnp.round(af / sa), -127, 127).astype(jnp.int8)
    w8 = jnp.clip(jnp.round(wf / sw), -127, 127).astype(jnp.int8)

    bm = min(block_m, max(-(-m // 8) * 8, 8))
    pad_m = -m % bm
    pad_n = -n % block_n
    if pad_m:
        a8 = jnp.pad(a8, ((0, pad_m), (0, 0)))
        sa = jnp.pad(sa, ((0, pad_m), (0, 0)))
    if pad_n:
        w8 = jnp.pad(w8, ((0, 0), (0, pad_n)))
        sw = jnp.pad(sw, ((0, 0), (0, pad_n)))
    mp, np_ = a8.shape[0], w8.shape[1]

    out = pl.pallas_call(
        _kernel,
        grid=(mp // bm, np_ // block_n),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0),
                         memory_space=pltpu.ANY if interpret
                         else pltpu.VMEM),
            pl.BlockSpec((k, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.ANY if interpret
                         else pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.ANY if interpret
                         else pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.ANY if interpret
                         else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, block_n), lambda i, j: (i, j),
                               memory_space=pltpu.ANY if interpret
                               else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * k * np_,
            bytes_accessed=mp * k + k * np_ + mp * np_ * 2,
            transcendentals=0),
        interpret=interpret,
    )(a8, w8, sa.astype(jnp.float32), sw.astype(jnp.float32))
    out = out[:m, :n]
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
