"""Pallas weight-only-int8 matmul: dequantize tiles in VMEM, never in HBM.

XLA compiles `x @ (q.astype(bf16) * scale)` by materializing the full
dequantized weight in HBM — measured 21x slower decode than bf16 (the
while_loop rebuilds every layer's weights every token). This kernel streams
the int8 tiles and dequantizes on-chip, so weight HBM traffic HALVES vs
bf16: decode (weight-bandwidth-bound) should run faster than bf16, not
slower, and that is the whole point of weight-only quantization on TPU.

x (M, K) resident per row stripe; q (K, BN) int8 + scale (BN,) stream.

Measured status (v5e via the axon runtime): the kernel itself is fast
(~9x a bf16 matmul when pipelined), but this runtime charges ~100us of
launch latency per Mosaic call once calls serialize through data
dependencies — a 12-layer decode step issues ~85 of them, so full-model
int8 decode is currently slower than bf16 here (47 vs 1.6 ms/step at
B=4). int8 loading remains a memory feature (weights halve); follow-ups
that cut the call count: fused qkv / gate-up quantized projections, or
a per-layer megakernel. On runtimes with ~us Mosaic launch overhead the
existing design should win outright.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _kernel(x_ref, q_ref, s_ref, o_ref, *, precision):
    # Dynamically quantize the (small) activation stripe per row and ride
    # the MXU's native int8 x int8 -> int32 path. Dequantizing the WEIGHT
    # tile instead (int8 -> bf16 elementwise) forces a Mosaic relayout of
    # the big operand every tile — measured 50x slower than this.
    del precision
    x = x_ref[:].astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    sx = jnp.maximum(amax, 1e-20) / 127.0
    xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, q_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[:] = (
        acc.astype(jnp.float32) * sx * s_ref[:].astype(jnp.float32)
    ).astype(o_ref.dtype)


def int8_matmul(
    x: Array,  # (..., K)
    q: Array,  # (K, N) int8
    scale: Array,  # (N,) float
    *,
    block_m: int = 256,
    block_n: int = 512,
    interpret: bool = False,
) -> Array:
    """-> (..., N) in x.dtype: x @ (q * scale), int8 dequantized in VMEM."""
    batch_shape = x.shape[:-1]
    K = x.shape[-1]
    N = q.shape[1]
    x2 = x.reshape(-1, K)
    M = x2.shape[0]

    bm = min(block_m, ((M + 7) // 8) * 8)
    bn = block_n
    pad_m = (-M) % bm
    if pad_m:
        x2 = jnp.pad(x2, ((0, pad_m), (0, 0)))
    pad_n = (-N) % bn
    if pad_n:
        q = jnp.pad(q, ((0, 0), (0, pad_n)))
        scale = jnp.pad(scale, (0, pad_n))
    Mp, Np = x2.shape[0], q.shape[1]

    precision = (
        jax.lax.Precision.HIGHEST
        if x.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    out = pl.pallas_call(
        functools.partial(_kernel, precision=precision),
        grid=(Mp // bm, Np // bn),
        in_specs=[
            pl.BlockSpec((bm, K), lambda m, n: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bn), lambda m, n: (0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda m, n: (0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda m, n: (m, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), x.dtype),
        interpret=interpret,
    )(x2, q, scale.reshape(1, -1))
    if pad_m or pad_n:
        out = out[:M, :N]
    return out.reshape(batch_shape + (N,))
