"""Pallas decode attention: single-token queries over a static KV cache.

Inference-path counterpart of ops/flash_attention.py (which serves training
prefill). The XLA dense decode path builds an fp32 bias and streams the
whole cache through generic fusions; this kernel keeps one (batch, kv-head)
cache panel resident in VMEM, computes the (n_rep, L) score row in fp32 on
the MXU and emits the output directly — no bias materialization, one pass
over K and V.

Status / measurement (v5e, B=64 L=896 H=12 D=128): parity holds, but XLA's
dense decode path already runs at ~peak HBM bandwidth (462 us/call vs this
kernel's 611 us) — single-layer decode attention is NOT the bottleneck, so
the model keeps the XLA path. This kernel stays as the starting point for
a round-2 *multi-layer fused* decode step (one kernel walking all layers'
caches with double-buffered DMA), which is where real headroom remains.

Layouts: q (B, KVH, n_rep, D); k/v (B, KVH, L, D); mask (B, L) validity.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

NEG_INF = -1e30


def _kernel(mask_ref, q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[0, 0].astype(jnp.float32)  # (n_rep, D)
    k = k_ref[0, 0].astype(jnp.float32)  # (L, D)
    v = v_ref[0, 0].astype(jnp.float32)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) * scale  # (n_rep, L)
    bias = jnp.where(mask_ref[0, 0] != 0, 0.0, NEG_INF)[None, :]
    s = s + bias

    m = jnp.maximum(jnp.max(s, axis=1, keepdims=True), NEG_INF / 2)
    p = jnp.exp(s - m)
    p = p / jnp.maximum(jnp.sum(p, axis=1, keepdims=True), 1e-30)

    o_ref[0, 0] = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(o_ref.dtype)


DEFAULT_BLOCK_L = 256


def _prefix_kernel(vb_ref, mask_ref, q_ref, k_ref, v_ref, o_ref,
                   m_s, s_s, acc_s, *, scale, n_l, precision):
    # one program owns one (batch row, key block) and ALL kv heads at once —
    # a (B, KVH, nL) grid was measured 2.6x slower from per-step overhead
    il = pl.program_id(1)

    @pl.when(il == 0)
    def _():
        m_s[:] = jnp.full_like(m_s, NEG_INF)
        s_s[:] = jnp.zeros_like(s_s)
        acc_s[:] = jnp.zeros_like(acc_s)

    @pl.when(il < vb_ref[0])
    def _():
        q = q_ref[0]  # (KVH, n_rep, D)
        k = k_ref[0]  # (KVH, BL, D)
        v = v_ref[0]

        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=precision,
        ) * scale  # (KVH, n_rep, BL)
        s = s + jnp.where(mask_ref[0, 0] != 0, 0.0, NEG_INF)[None, None, :]

        m_old = m_s[:]
        m_new = jnp.maximum(
            m_old,
            jnp.maximum(jnp.max(s, axis=2, keepdims=True), NEG_INF / 2),
        )
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m_old - m_new)
        s_s[:] = s_s[:] * corr + jnp.sum(p, axis=2, keepdims=True)
        acc_s[:] = acc_s[:] * corr + jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        m_s[:] = m_new

    @pl.when(il == n_l - 1)
    def _():
        o_ref[0] = (acc_s[:] / jnp.maximum(s_s[:], 1e-30)).astype(o_ref.dtype)


def decode_attention_prefix(
    q: Array,  # (B, H, D) single-position queries
    k: Array,  # (B, L, KVH, D) cache (static max length)
    v: Array,  # (B, L, KVH, D)
    mask: Array,  # (B, L) key validity within the prefix
    valid_len: Array,  # scalar int32: cache columns [0, valid_len) are live
    *,
    block_l: Optional[int] = None,
    interpret: bool = False,
) -> Array:
    """Prefix-proportional decode attention: HBM traffic scales with the
    LIVE cache prefix, not the static max_len. valid_len rides scalar
    prefetch so the k/v index map clamps out-of-range blocks to the last
    live one — a revisited block is never refetched, so dead cache columns
    cost neither bandwidth nor (via @pl.when) compute. -> (B, H, D).
    """
    B, H, D = q.shape
    L, KVH = k.shape[1], k.shape[2]
    n_rep = H // KVH
    scale = 1.0 / (D ** 0.5)
    if block_l is None:
        # Mosaic lane constraint: the (1, 1, block_l) mask block needs a
        # 128-multiple in the last dim, so cache lengths must be 128-aligned
        # (the engines round max_len up accordingly).
        block_l = next(
            (b for b in (DEFAULT_BLOCK_L, 128) if L % b == 0), None
        )
        assert block_l, f"L={L} not a multiple of 128"
    n_l = pl.cdiv(L, block_l)
    assert L % block_l == 0, (L, block_l)

    qg = q.reshape(B, KVH, n_rep, D)
    kt = k.transpose(0, 2, 1, 3)  # (B, KVH, L, D)
    vt = v.transpose(0, 2, 1, 3)
    vb = jnp.maximum((valid_len + block_l - 1) // block_l, 1)
    vb = jnp.asarray(vb, jnp.int32).reshape(1)
    precision = (
        jax.lax.Precision.HIGHEST
        if q.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    def kv_map(b, l, vb_ref):
        return (b, 0, jnp.minimum(l, vb_ref[0] - 1), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_l),
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_l),
                lambda b, l, vb_ref: (b, 0, jnp.minimum(l, vb_ref[0] - 1)),
            ),
            pl.BlockSpec((1, KVH, n_rep, D), lambda b, l, vb_ref: (b, 0, 0, 0)),
            pl.BlockSpec((1, KVH, block_l, D), kv_map),
            pl.BlockSpec((1, KVH, block_l, D), kv_map),
        ],
        out_specs=pl.BlockSpec(
            (1, KVH, n_rep, D), lambda b, l, vb_ref: (b, 0, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((KVH, n_rep, 1), jnp.float32),
            pltpu.VMEM((KVH, n_rep, 1), jnp.float32),
            pltpu.VMEM((KVH, n_rep, D), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_prefix_kernel, scale=scale, n_l=n_l,
                          precision=precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KVH, n_rep, D), q.dtype),
        interpret=interpret,
    )(vb, mask.astype(jnp.int32)[:, None, :], qg, kt, vt)
    return out.reshape(B, H, D)


def _prefix_kernel_int8(vb_ref, mask_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref,
                        o_ref, m_s, s_s, acc_s, *, scale, n_l):
    # int8 cache variant: the k/v tiles stay int8 and feed the MXU's native
    # int8 x int8 -> int32 path. Dequantizing the big tiles in VMEM
    # (int8->f32 elementwise) triggers the Mosaic big-operand relayout —
    # measured 2x the whole decode step at B=16. Instead the SMALL side is
    # quantized: q per (head, row), and p gets the per-token v scale folded
    # in before its own row quantization (scales on the contracted axis
    # cannot factor out of the matmul; scales on output axes can).
    il = pl.program_id(1)

    @pl.when(il == 0)
    def _():
        m_s[:] = jnp.full_like(m_s, NEG_INF)
        s_s[:] = jnp.zeros_like(s_s)
        acc_s[:] = jnp.zeros_like(acc_s)

    @pl.when(il < vb_ref[0])
    def _():
        q = q_ref[0].astype(jnp.float32)  # (KVH, n_rep, D)
        ks = ks_ref[0]  # (KVH, BL) per-token k scales
        vs = vs_ref[0]

        sq = jnp.maximum(jnp.max(jnp.abs(q), axis=2, keepdims=True),
                         1e-20) / 127.0
        q8 = jnp.clip(jnp.round(q / sq), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            q8, k_ref[0], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )  # (KVH, n_rep, BL) int32
        s = acc.astype(jnp.float32) * sq * ks[:, None, :] * scale
        s = s + jnp.where(mask_ref[0, 0] != 0, 0.0, NEG_INF)[None, None, :]

        m_old = m_s[:]
        m_new = jnp.maximum(
            m_old,
            jnp.maximum(jnp.max(s, axis=2, keepdims=True), NEG_INF / 2),
        )
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m_old - m_new)
        s_s[:] = s_s[:] * corr + jnp.sum(p, axis=2, keepdims=True)

        pv = p * vs[:, None, :]  # fold the contracted-axis v scale into p
        sp = jnp.maximum(jnp.max(jnp.abs(pv), axis=2, keepdims=True),
                         1e-20) / 127.0
        p8 = jnp.clip(jnp.round(pv / sp), -127, 127).astype(jnp.int8)
        accv = jax.lax.dot_general(
            p8, v_ref[0], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )  # (KVH, n_rep, D) int32
        acc_s[:] = acc_s[:] * corr + accv.astype(jnp.float32) * sp
        m_s[:] = m_new

    @pl.when(il == n_l - 1)
    def _():
        o_ref[0] = (acc_s[:] / jnp.maximum(s_s[:], 1e-30)).astype(o_ref.dtype)


def quantize_kv(x: Array):
    """(B, L, KVH, D) float -> (int8 values, (B, L, KVH) f32 scales);
    symmetric per-(token, head) over D."""
    a = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    s = jnp.maximum(a, 1e-20) / 127.0
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / s[..., None]), -127, 127
    ).astype(jnp.int8)
    return q, s


def dequantize_kv(q: Array, s: Array, dtype) -> Array:
    return (q.astype(jnp.float32) * s[..., None].astype(jnp.float32)).astype(
        dtype
    )


def decode_attention_prefix_int8(
    q: Array,  # (B, H, D) single-position queries
    k: Array,  # (B, L, KVH, D) int8 cache
    k_scale: Array,  # (B, L, KVH) f32
    v: Array,  # (B, L, KVH, D) int8
    v_scale: Array,  # (B, L, KVH) f32
    mask: Array,  # (B, L)
    valid_len: Array,
    *,
    block_l: Optional[int] = None,
    interpret: bool = False,
) -> Array:
    """Prefix decode attention over an int8 KV cache -> (B, H, D). Falls
    back to dense-over-dequantized off TPU (identical math at fp32)."""
    B, H, D = q.shape
    L, KVH = k.shape[1], k.shape[2]
    n_rep = H // KVH

    use_pallas = interpret or jax.default_backend() == "tpu"
    if block_l is None:
        block_l = next(
            (b for b in (DEFAULT_BLOCK_L, 128) if L % b == 0), None
        )
    if not use_pallas or block_l is None:
        from rlaifv_tpu.ops.attention import _build_bias, dense_attention, repeat_kv

        kd = dequantize_kv(k, k_scale, q.dtype)
        vd = dequantize_kv(v, v_scale, q.dtype)
        bias = _build_bias(1, L, mask, False, None, B)
        return dense_attention(
            q[:, None], repeat_kv(kd, n_rep), repeat_kv(vd, n_rep), bias
        )[:, 0]

    scale = 1.0 / (D ** 0.5)
    n_l = pl.cdiv(L, block_l)
    qg = q.reshape(B, KVH, n_rep, D)
    kt = k.transpose(0, 2, 1, 3)  # (B, KVH, L, D) int8
    vt = v.transpose(0, 2, 1, 3)
    kst = k_scale.transpose(0, 2, 1)  # (B, KVH, L)
    vst = v_scale.transpose(0, 2, 1)
    vb = jnp.maximum((valid_len + block_l - 1) // block_l, 1)
    vb = jnp.asarray(vb, jnp.int32).reshape(1)
    precision = (
        jax.lax.Precision.HIGHEST
        if q.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    def kv_map(b, l, vb_ref):
        return (b, 0, jnp.minimum(l, vb_ref[0] - 1), 0)

    def s_map(b, l, vb_ref):
        return (b, 0, jnp.minimum(l, vb_ref[0] - 1))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_l),
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_l),
                lambda b, l, vb_ref: (b, 0, jnp.minimum(l, vb_ref[0] - 1)),
            ),
            pl.BlockSpec((1, KVH, n_rep, D), lambda b, l, vb_ref: (b, 0, 0, 0)),
            pl.BlockSpec((1, KVH, block_l, D), kv_map),
            pl.BlockSpec((1, KVH, block_l), s_map),
            pl.BlockSpec((1, KVH, block_l, D), kv_map),
            pl.BlockSpec((1, KVH, block_l), s_map),
        ],
        out_specs=pl.BlockSpec(
            (1, KVH, n_rep, D), lambda b, l, vb_ref: (b, 0, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((KVH, n_rep, 1), jnp.float32),
            pltpu.VMEM((KVH, n_rep, 1), jnp.float32),
            pltpu.VMEM((KVH, n_rep, D), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_prefix_kernel_int8, scale=scale, n_l=n_l),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KVH, n_rep, D), q.dtype),
        interpret=interpret,
    )(vb, mask.astype(jnp.int32)[:, None, :], qg, kt, kst, vt, vst)
    return out.reshape(B, H, D)


def decode_attention(
    q: Array,  # (B, H, D) single-position queries
    k: Array,  # (B, L, KVH, D) cache
    v: Array,  # (B, L, KVH, D)
    mask: Array,  # (B, L) key validity (causality folded in by the caller)
    *,
    interpret: bool = False,
) -> Array:
    """-> (B, H, D)."""
    B, H, D = q.shape
    L, KVH = k.shape[1], k.shape[2]
    n_rep = H // KVH
    scale = 1.0 / (D ** 0.5)

    qg = q.reshape(B, KVH, n_rep, D)
    kt = k.transpose(0, 2, 1, 3)  # (B, KVH, L, D)
    vt = v.transpose(0, 2, 1, 3)

    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=(B, KVH),
        in_specs=[
            pl.BlockSpec((1, 1, L), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_rep, D), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L, D), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L, D), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, n_rep, D), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, KVH, n_rep, D), q.dtype),
        interpret=interpret,
    )(mask.astype(jnp.int32)[:, None, :], qg, kt, vt)
    return out.reshape(B, H, D)
