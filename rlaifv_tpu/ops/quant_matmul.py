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
import os
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
    block_m: Optional[int] = None,
    block_n: Optional[int] = None,
    interpret: bool = False,
) -> Array:
    """-> (..., N) in x.dtype: x @ (q * scale), int8 dequantized in VMEM."""
    interpret = interpret or jax.default_backend() != "tpu"
    batch_shape = x.shape[:-1]
    K = x.shape[-1]
    N = q.shape[1]
    x2 = x.reshape(-1, K)
    M = x2.shape[0]

    # VMEM per program ~ bm*K*(2+4+1 bytes: bf16 in, f32 quant staging,
    # int8) + K*bn (int8 weight) + bm*bn*4; halve blocks for wide K so the
    # 7B down_proj (K=11008) stays under the ~16M scoped budget.
    # Mosaic double-buffers streamed blocks; wide-K (7B down_proj
    # K=11008) needs small tiles to fit the 16M scoped budget
    if block_m is None:
        block_m = 256 if K <= 8192 else 128
        # prefer a block that DIVIDES M (same rationale as block_n below):
        # padding M materializes the padded output as a separate HLO temp
        # plus a pad/slice copy pair at EVERY call site — measured 5.6G of
        # unfused pad/slice temps across a 32-layer remat backward at 7B
        # paired geometry (M=5788)
        block_m = next((b for b in (256, 128) if b <= block_m and M % b == 0),
                       block_m)
    if block_n is None:
        # prefer a block that DIVIDES N: padding N makes the padded
        # (Mp, Np) output an HLO temp (352M per call at 7B mlp width)
        cap = 512 if K <= 8192 else 128
        block_n = next((b for b in (512, 256, 128) if b <= cap and N % b == 0),
                       cap)
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


# -------------------------------------------------------- backward (dx)


def _dx_kernel(dy_ref, s_ref, q_ref, o_ref):
    # dx = (dy * scale) @ q^T, contracting q's N axis in place (no transpose
    # of the int8 weight is ever materialized). The scaled cotangent stripe
    # is dynamically quantized per row, exactly like the forward quantizes
    # activations — the same precision contract on both passes.
    dy = dy_ref[:].astype(jnp.float32) * s_ref[:].astype(jnp.float32)
    amax = jnp.max(jnp.abs(dy), axis=1, keepdims=True)
    sy = jnp.maximum(amax, 1e-20) / 127.0
    dyq = jnp.clip(jnp.round(dy / sy), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        dyq, q_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (BM, BK)
    o_ref[:] = (acc.astype(jnp.float32) * sy).astype(o_ref.dtype)


def int8_matmul_dx(
    dy: Array,  # (..., N) cotangent of int8_matmul's output
    q: Array,  # (K, N) int8 — same layout as the forward
    scale: Array,  # (N,)
    *,
    block_m: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: bool = False,
) -> Array:
    """-> (..., K): (dy * scale) @ q^T with q kept int8 in HBM."""
    interpret = interpret or jax.default_backend() != "tpu"
    batch_shape = dy.shape[:-1]
    N = dy.shape[-1]
    K = q.shape[0]
    dy2 = dy.reshape(-1, N)
    M = dy2.shape[0]

    # VMEM: dy stripe (bm, N) in bf16 + f32 quant staging + int8, plus the
    # (bk, N) int8 weight block; shrink both for wide N (7B down_proj dx
    # has N=11008).
    if block_m is None:
        block_m = 256 if N <= 8192 else 128
        # prefer an M-dividing block — see int8_matmul
        block_m = next((b for b in (256, 128) if b <= block_m and M % b == 0),
                       block_m)
    bm = min(block_m, ((M + 7) // 8) * 8)
    if block_k is None:
        cap = 512 if N <= 8192 else 128
        block_k = next((b for b in (512, 256, 128) if b <= cap and K % b == 0),
                       cap)
    bk = block_k
    pad_m = (-M) % bm
    if pad_m:
        dy2 = jnp.pad(dy2, ((0, pad_m), (0, 0)))
    pad_k = (-K) % bk
    if pad_k:
        q = jnp.pad(q, ((0, pad_k), (0, 0)))
    pad_n = (-N) % 128
    if pad_n:
        dy2 = jnp.pad(dy2, ((0, 0), (0, pad_n)))
        q = jnp.pad(q, ((0, 0), (0, pad_n)))
        scale = jnp.pad(scale, (0, pad_n))
    Mp, Kp, Np = dy2.shape[0], q.shape[0], dy2.shape[1]

    out = pl.pallas_call(
        _dx_kernel,
        grid=(Mp // bm, Kp // bk),
        in_specs=[
            pl.BlockSpec((bm, Np), lambda m, k: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np), lambda m, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, Np), lambda m, k: (k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bk), lambda m, k: (m, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Kp), dy.dtype),
        interpret=interpret,
    )(dy2, scale.reshape(1, -1), q)
    if pad_m or pad_k:
        out = out[:M, :K]
    return out.reshape(batch_shape + (K,))


# Row-count crossover between int8 strategies (A/B-measured on v5e
# END-TO-END — isolated microbenches mislead on this runtime). Small M
# (decode steps, M = batch <= 32, inside the token while_loop): the
# in-kernel-quantization Pallas kernel wins — XLA dequant there rebuilds
# every layer's bf16 weights per token (measured 21x slower). Large M
# (prefill/training, compute-bound, straight-line) ranked by the 7B QLoRA
# step / 7B autocheck:
#   prequant  2074.1 ms / 13.25 facts/s   <- default
#   dequant   2499.9 ms / 11.10 facts/s
#   kernel    2575.9 ms / 10.70 facts/s
# prequant = rowwise activation quantization hoisted into ONE fused XLA
# pass, then a pure int8xint8 Pallas matmul on the MXU's double-rate int8
# path; the in-kernel variant redoes the quantization per N-tile (Np/bn
# redundant VPU passes), and dequant caps at the bf16 MXU rate. prequant's
# precision contract equals the kernel's (identical rowwise act quant);
# dequant is exact per channel (no act quant) and stays selectable via
# RLAIFV_INT8_LARGE_M_IMPL=dequant for accuracy-sensitive runs.
INT8_DEQUANT_MIN_M = int(os.environ.get("RLAIFV_INT8_DEQUANT_MIN_M", "128"))


def _dequant_matmul(x: Array, q: Array, scale: Array) -> Array:
    """x @ (q * scale) with the dequant left to XLA (compute-bound shapes).

    Same formula as QuantDense's CPU fallback, bit-for-bit."""
    w = q.astype(x.dtype) * scale.astype(x.dtype)[None, :]
    return jax.lax.dot_general(x, w, (((x.ndim - 1,), (0,)), ((), ())))


# ------------------------------------------- prequantized large-M kernel


def _prequant_kernel(xq_ref, sx_ref, q_ref, s_ref, o_ref):
    # Pure int8 x int8 -> int32 MXU work: activations arrive already
    # quantized (one fused XLA pass over x in HBM), so nothing is staged in
    # f32 and the row quantization is not redone per N-tile the way
    # _kernel's in-kernel quantization is (grid re-runs it Np/bn times).
    acc = jax.lax.dot_general(
        xq_ref[:], q_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[:] = (
        acc.astype(jnp.float32)
        * sx_ref[:].astype(jnp.float32)
        * s_ref[:].astype(jnp.float32)
    ).astype(o_ref.dtype)


def int8_matmul_prequant(
    x: Array,  # (..., K)
    q: Array,  # (K, N) int8
    scale: Array,  # (N,) float
    *,
    block_m: Optional[int] = None,
    block_n: Optional[int] = None,
    interpret: bool = False,
) -> Array:
    """x @ (q * scale) at prefill/training shapes: rowwise-quantize x once
    via XLA (int8 + per-row scale), then a Pallas int8xint8 matmul rides
    the MXU's double-rate int8 path. Same math as int8_matmul (identical
    activation quantization), different schedule."""
    interpret = interpret or jax.default_backend() != "tpu"
    batch_shape = x.shape[:-1]
    K = x.shape[-1]
    N = q.shape[1]
    x2 = x.reshape(-1, K).astype(jnp.float32)
    M = x2.shape[0]

    amax = jnp.max(jnp.abs(x2), axis=1, keepdims=True)
    sx = jnp.maximum(amax, 1e-20) / 127.0
    xq = jnp.clip(jnp.round(x2 / sx), -127, 127).astype(jnp.int8)

    # VMEM per program ~ 2x double-buffered int8 blocks: bm*K (x stripe) +
    # K*bn (weight) + bm*bn*4 (f32 out). 7B widths (K<=11008) fit 256/256;
    # EVA02-enormous fc2 (K=15360) needs 256/128 (256/256 blew the 16M
    # scoped budget by 3M on the 12B serve bench).
    if block_m is None:
        block_m = 512 if K <= 8192 else 256
        # prefer an M-dividing block — see int8_matmul
        block_m = next((b for b in (512, 256, 128)
                        if b <= block_m and M % b == 0), block_m)
    if block_n is None:
        cap = 512 if K <= 8192 else 256 if K <= 12288 else 128
        block_n = next((b for b in (512, 256, 128) if b <= cap and N % b == 0),
                       cap)
    bm = min(block_m, ((M + 7) // 8) * 8)
    bn = block_n
    pad_m = (-M) % bm
    if pad_m:
        xq = jnp.pad(xq, ((0, pad_m), (0, 0)))
        sx = jnp.pad(sx, ((0, pad_m), (0, 0)))
    pad_n = (-N) % bn
    if pad_n:
        q = jnp.pad(q, ((0, 0), (0, pad_n)))
        scale = jnp.pad(scale, (0, pad_n))
    Mp, Np = xq.shape[0], q.shape[1]

    out = pl.pallas_call(
        _prequant_kernel,
        grid=(Mp // bm, Np // bn),
        in_specs=[
            pl.BlockSpec((bm, K), lambda m, n: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda m, n: (m, 0),
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
    )(xq, sx, q, scale.reshape(1, -1))
    if pad_m or pad_n:
        out = out[:M, :N]
    return out.reshape(batch_shape + (N,))


def _dequant_matmul_dx(dy: Array, q: Array, scale: Array) -> Array:
    """(dy * scale) @ q^T via XLA dequant (large-M backward)."""
    w = q.astype(dy.dtype) * scale.astype(dy.dtype)[None, :]
    return jax.lax.dot_general(
        dy, w, (((dy.ndim - 1,), (1,)), ((), ()))
    )


def _prequant_dx_kernel(dyq_ref, sy_ref, q_ref, o_ref):
    acc = jax.lax.dot_general(
        dyq_ref[:], q_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (BM, BK)
    o_ref[:] = (
        acc.astype(jnp.float32) * sy_ref[:].astype(jnp.float32)
    ).astype(o_ref.dtype)


def int8_matmul_dx_prequant(
    dy: Array,  # (..., N)
    q: Array,  # (K, N) int8
    scale: Array,  # (N,)
    *,
    block_m: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: bool = False,
) -> Array:
    """(dy * scale) @ q^T with the scaled cotangent rowwise-quantized ONCE
    via XLA (int8_matmul_dx quantizes the same stripe per k-tile — Kp/bk
    redundant VPU passes); the Pallas grid then does pure int8xint8 work."""
    interpret = interpret or jax.default_backend() != "tpu"
    batch_shape = dy.shape[:-1]
    N = dy.shape[-1]
    K = q.shape[0]
    dys = dy.reshape(-1, N).astype(jnp.float32) * scale.astype(jnp.float32)
    M = dys.shape[0]

    amax = jnp.max(jnp.abs(dys), axis=1, keepdims=True)
    sy = jnp.maximum(amax, 1e-20) / 127.0
    dyq = jnp.clip(jnp.round(dys / sy), -127, 127).astype(jnp.int8)

    # same budget arithmetic as the forward, with the stripe spanning N
    block_m = block_m or (512 if N <= 8192 else 256 if N <= 12288 else 128)
    bm = min(block_m, ((M + 7) // 8) * 8)
    if block_k is None:
        cap = 512 if N <= 8192 else 256 if N <= 12288 else 128
        block_k = next((b for b in (512, 256, 128) if b <= cap and K % b == 0),
                       cap)
    bk = block_k
    pad_m = (-M) % bm
    if pad_m:
        dyq = jnp.pad(dyq, ((0, pad_m), (0, 0)))
        sy = jnp.pad(sy, ((0, pad_m), (0, 0)))
    pad_k = (-K) % bk
    if pad_k:
        q = jnp.pad(q, ((0, pad_k), (0, 0)))
    pad_n = (-N) % 128
    if pad_n:  # int8 zero columns contribute exact zeros
        dyq = jnp.pad(dyq, ((0, 0), (0, pad_n)))
        q = jnp.pad(q, ((0, 0), (0, pad_n)))
    Mp, Kp, Np = dyq.shape[0], q.shape[0], dyq.shape[1]

    out = pl.pallas_call(
        _prequant_dx_kernel,
        grid=(Mp // bm, Kp // bk),
        in_specs=[
            pl.BlockSpec((bm, Np), lambda m, k: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda m, k: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, Np), lambda m, k: (k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bk), lambda m, k: (m, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Kp), dy.dtype),
        interpret=interpret,
    )(dyq, sy, q)
    if pad_m or pad_k:
        out = out[:M, :K]
    return out.reshape(batch_shape + (K,))


@jax.custom_vjp
def int8_matmul_grad(x: Array, q: Array, scale: Array) -> Array:
    """Shape-dispatched int8-weight matmul with a backward pass w.r.t. x
    only (the int8 weight is frozen by construction — QLoRA-style training:
    adapters learn, base doesn't). dq/dscale cotangents are symbolic zeros.

    Decode shapes (rows < INT8_DEQUANT_MIN_M) use the Pallas kernel;
    prefill/training shapes use the XLA-dequant matmul (see the crossover
    note above). Dispatch is static at trace time, so a decode while_loop
    and a prefill call each compile exactly one strategy."""
    return _int8_matmul_fwd_dispatch(x, q, scale)


# Large-M strategy selector (A/B hook; ranking in the crossover note):
# prequant (default) | dequant | kernel.
INT8_LARGE_M_IMPL = os.environ.get("RLAIFV_INT8_LARGE_M_IMPL", "prequant")


def _int8_matmul_fwd_dispatch(x, q, scale):
    m = 1
    for d in x.shape[:-1]:
        m *= d
    if m >= INT8_DEQUANT_MIN_M and jax.default_backend() == "tpu":
        if INT8_LARGE_M_IMPL == "prequant":
            return int8_matmul_prequant(x, q, scale)
        if INT8_LARGE_M_IMPL == "dequant":
            return _dequant_matmul(x, q, scale)
    return int8_matmul(x, q, scale)


def _grad_fwd(x, q, scale):
    return _int8_matmul_fwd_dispatch(x, q, scale), (q, scale)


def _grad_bwd(res, dy):
    import numpy as np

    q, scale = res
    m = 1
    for d in dy.shape[:-1]:
        m *= d
    if m >= INT8_DEQUANT_MIN_M and jax.default_backend() == "tpu":
        if INT8_LARGE_M_IMPL == "prequant":
            dx = int8_matmul_dx_prequant(dy, q, scale)
        elif INT8_LARGE_M_IMPL == "dequant":
            dx = _dequant_matmul_dx(dy, q, scale)
        else:
            dx = int8_matmul_dx(dy, q, scale)
    else:
        dx = int8_matmul_dx(dy, q, scale)
    return (
        dx,
        np.zeros(q.shape, dtype=jax.dtypes.float0),
        jnp.zeros_like(scale),
    )


int8_matmul_grad.defvjp(_grad_fwd, _grad_bwd)
