"""Pallas fused LM-head: target-token log-probabilities without logits.

The DPO/logp training path only ever needs `logp[t] = logit[t, y_t] - lse_t`
(ref: muffin/eval/muffin_inference_logp.py:82-115 get_batch_logps applied to
the full (B, L, V) logits of LlamaForCausalLM). Materializing those logits is
the single largest activation in the step — (2B, L, 32000) in bf16 is
gigabytes at 7B shapes — and they are consumed only by a logsumexp and a
gather. This kernel fuses the lm_head matmul with an online logsumexp and the
label gather so the (M, V) score matrix never leaves VMEM:

- forward: grid (rows/BM, V/BV); the hidden block stays resident across the
  inner vocab loop while W tiles stream; running (max, sumexp, target-logit)
  live in VMEM scratch; one (M,) fp32 logp vector comes out.
- backward: d logit[i, v] = g_i * (1{v==y_i} - softmax_iv). Two kernels
  recompute the score tiles from the saved row logsumexp (the flash-attention
  trick applied to the vocab axis) and accumulate into their fp32 output
  block, which Mosaic keeps resident in VMEM across the consecutive revisits:
    dhidden: grid (rows/BM, V/BV), dx[m] += dl @ W_tile^T.
    dW:      grid (V/BV, rows/BM), W-tile-stationary, dW[v] += x^T @ dl.
  Nothing of size (M, V) is ever written to HBM in either direction.

Cost/when-to-use: backward recomputes the score matmul in both kernels, so
the head costs 5 matmuls vs the XLA path's 3. Each kernel is compute-bound
(arithmetic intensity ~2*block vs the MXU ridge), so this wins when XLA's
(M, V) materializations dominate — and always wins on memory. Measured v5e
bf16 M=8192 H=1024 V=32000: see tests/run_tpu_checks.py / PARITY.md.

MXU notes: matmuls carry preferred_element_type=fp32; for fp32 inputs the
wrapper pins precision=HIGHEST (default MXU passes are bf16 — measured 7e-3
error on the decode kernel before the same fix). bf16 inputs are exact.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

NEG_INF = -1e30

# Mosaic's scoped-vmem use runs ~2x this model (measured on v5e: modeled
# 8.1MB -> 16.8MB scoped). 7MB modeled keeps kernels under the 16MB limit.
_VMEM_BUDGET = 7 << 20
_BLOCK_CANDIDATES = (1024, 896, 768, 640, 512, 384, 256, 128)


def _solve_blocks(M: int, V: int, cost_fn) -> Tuple[int, int]:
    best, best_key = (128, 128), (0, 0)
    for bm in _BLOCK_CANDIDATES:
        for bv in _BLOCK_CANDIDATES:
            if cost_fn(bm, bv) <= _VMEM_BUDGET:
                key = (bm * bv, bm + bv)
                if key > best_key:
                    best, best_key = (bm, bv), key
    bm = min(best[0], ((M + 127) // 128) * 128)
    bv = min(best[1], ((V + 127) // 128) * 128)
    return bm, bv


def _fwd_blocks(M, H, V, i):
    # x and w double-buffered + ~3 fp32 (BM,BV) temporaries
    return _solve_blocks(
        M, V, lambda bm, bv: 2 * bm * H * i + 2 * H * bv * i + 12 * bm * bv
    )


# Above this hidden size the forward streams H in chunks (acc scratch) so the
# row/vocab tiles stay large: at H=4096 the single-pass solver is squeezed to
# 256x128 tiles, H-blocking restores 768x256. Measured v5e fwd at
# M=4096 H=4096 V=32000: hblocked(1024) 8.57 ms vs single-pass 8.63 vs XLA
# 6.42 — the kernel is pipeline-bound, not tile-bound, so this is parity,
# not a win; bh=512 is WORSE (9.07). Kept because the larger tiles cut W
# re-streaming by ~2.7x (matters as M grows) and for VMEM headroom.
_FWD_HBLOCK_THRESHOLD = 2048
_FWD_BLOCK_H = 1024


def _fwd_blocks_hblocked(M, V, bh, i):
    # x/w chunks double-buffered + fp32 acc + ~3 fp32 temporaries at the
    # last-h online update
    return _solve_blocks(
        M, V,
        lambda bm, bv: 2 * bm * bh * i + 2 * bh * bv * i + 16 * bm * bv,
    )


def _dx_blocks(M, H, V, i):
    # + fp32 out block accumulated in VMEM
    return _solve_blocks(
        M, V,
        lambda bm, bv: 2 * bm * H * i + 2 * H * bv * i + 4 * bm * H
        + 12 * bm * bv,
    )


def _dw_blocks(M, H, V, i):
    return _solve_blocks(
        M, V,
        lambda bm, bv: 2 * bm * H * i + 2 * H * bv * i + 4 * H * bv
        + 12 * bm * bv,
    )


def _dot(a, b, dims, precision):
    return jax.lax.dot_general(
        a, b, (dims, ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )


def _score_tile(x_ref, w_ref, iv, block_v, vocab, precision):
    """fp32 (BM, BV) logits tile with out-of-vocab columns at -inf."""
    s = _dot(x_ref[:], w_ref[:], ((1,), (0,)), precision)
    cols = iv * block_v + jax.lax.broadcasted_iota(
        jnp.int32, s.shape, 1
    )
    return jnp.where(cols < vocab, s, NEG_INF), cols


# ---------------------------------------------------------------- forward


def _fwd_kernel(x_ref, w_ref, y_ref, logp_ref, lse_ref,
                m_s, s_s, t_s, *, block_v, n_v, vocab, precision):
    iv = pl.program_id(1)

    @pl.when(iv == 0)
    def _():
        m_s[:] = jnp.full_like(m_s, NEG_INF)
        s_s[:] = jnp.zeros_like(s_s)
        t_s[:] = jnp.zeros_like(t_s)

    s, cols = _score_tile(x_ref, w_ref, iv, block_v, vocab, precision)

    m_old = m_s[:]
    m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
    s_s[:] = s_s[:] * jnp.exp(m_old - m_new) + jnp.sum(
        jnp.exp(s - m_new), axis=1, keepdims=True
    )
    m_s[:] = m_new
    t_s[:] = t_s[:] + jnp.sum(
        jnp.where(cols == y_ref[:], s, 0.0), axis=1, keepdims=True
    )

    @pl.when(iv == n_v - 1)
    def _():
        lse = m_s[:] + jnp.log(jnp.maximum(s_s[:], 1e-30))
        lse_ref[:] = lse
        logp_ref[:] = t_s[:] - lse


def _fwd_kernel_hblocked(x_ref, w_ref, y_ref, logp_ref, lse_ref,
                         acc_s, m_s, s_s, t_s,
                         *, block_v, n_v, n_h, vocab, precision):
    """H-blocked forward: the (BM, BV) score tile accumulates over H chunks
    in fp32 scratch; the online (max, sumexp, target) update runs once per
    vocab tile, after the contraction completes."""
    iv = pl.program_id(1)
    ih = pl.program_id(2)

    @pl.when((iv == 0) & (ih == 0))
    def _():
        m_s[:] = jnp.full_like(m_s, NEG_INF)
        s_s[:] = jnp.zeros_like(s_s)
        t_s[:] = jnp.zeros_like(t_s)

    @pl.when(ih == 0)
    def _():
        acc_s[:] = jnp.zeros_like(acc_s)

    acc_s[:] = acc_s[:] + _dot(x_ref[:], w_ref[:], ((1,), (0,)), precision)

    @pl.when(ih == n_h - 1)
    def _():
        cols = iv * block_v + jax.lax.broadcasted_iota(
            jnp.int32, acc_s.shape, 1
        )
        s = jnp.where(cols < vocab, acc_s[:], NEG_INF)

        m_old = m_s[:]
        m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
        s_s[:] = s_s[:] * jnp.exp(m_old - m_new) + jnp.sum(
            jnp.exp(s - m_new), axis=1, keepdims=True
        )
        m_s[:] = m_new
        t_s[:] = t_s[:] + jnp.sum(
            jnp.where(cols == y_ref[:], s, 0.0), axis=1, keepdims=True
        )

        @pl.when(iv == n_v - 1)
        def _():
            lse = m_s[:] + jnp.log(jnp.maximum(s_s[:], 1e-30))
            lse_ref[:] = lse
            logp_ref[:] = t_s[:] - lse


def _fwd_hblocked(x, w, y, block_m, block_v, block_h, precision, interpret):
    (x, y), M_true = _pad_rows((x, y), block_m)
    M, H = x.shape
    V = w.shape[1]
    n_m = M // block_m
    n_v = pl.cdiv(V, block_v)
    n_h = pl.cdiv(H, block_h)
    vpad = n_v * block_v
    hpad = n_h * block_h
    if vpad != V or hpad != H:
        w = jnp.pad(w, ((0, hpad - H), (0, vpad - V)))
    if hpad != H:
        x = jnp.pad(x, ((0, 0), (0, hpad - H)))

    kernel = functools.partial(
        _fwd_kernel_hblocked, block_v=block_v, n_v=n_v, n_h=n_h,
        vocab=V, precision=precision,
    )
    logp, lse = pl.pallas_call(
        kernel,
        grid=(n_m, n_v, n_h),
        in_specs=[
            pl.BlockSpec((block_m, block_h), lambda m, v, h: (m, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_h, block_v), lambda m, v, h: (h, v),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda m, v, h: (m, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_m, 1), lambda m, v, h: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda m, v, h: (m, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, 1), jnp.float32),
            jax.ShapeDtypeStruct((M, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_m, block_v), jnp.float32),
            pltpu.VMEM((block_m, 1), jnp.float32),
            pltpu.VMEM((block_m, 1), jnp.float32),
            pltpu.VMEM((block_m, 1), jnp.float32),
        ],
        interpret=interpret,
    )(x, w, y[:, None])
    return logp[:M_true, 0], lse[:M_true]


def _pad_rows(arrs, bm):
    M = arrs[0].shape[0]
    pad = (-M) % bm
    if not pad:
        return arrs, M
    out = []
    for a in arrs:
        cfg = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        out.append(jnp.pad(a, cfg))
    return out, M


def _fwd(x, w, y, block_m, block_v, precision, interpret):
    (x, y), M_true = _pad_rows((x, y), block_m)
    M, H = x.shape
    V = w.shape[1]
    n_m = M // block_m
    n_v = pl.cdiv(V, block_v)
    vpad = n_v * block_v
    if vpad != V:
        w = jnp.pad(w, ((0, 0), (0, vpad - V)))

    kernel = functools.partial(
        _fwd_kernel, block_v=block_v, n_v=n_v, vocab=V, precision=precision
    )
    logp, lse = pl.pallas_call(
        kernel,
        grid=(n_m, n_v),
        in_specs=[
            pl.BlockSpec((block_m, H), lambda m, v: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, block_v), lambda m, v: (0, v),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda m, v: (m, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_m, 1), lambda m, v: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda m, v: (m, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, 1), jnp.float32),
            jax.ShapeDtypeStruct((M, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_m, 1), jnp.float32),
            pltpu.VMEM((block_m, 1), jnp.float32),
            pltpu.VMEM((block_m, 1), jnp.float32),
        ],
        interpret=interpret,
    )(x, w, y[:, None])
    return logp[:M_true, 0], lse[:M_true]


# ---------------------------------------------------------------- backward


def _dl_tile(x_ref, w_ref, y_ref, lse_ref, g_ref, iv, block_v, vocab,
             precision):
    s, cols = _score_tile(x_ref, w_ref, iv, block_v, vocab, precision)
    p = jnp.exp(s - lse_ref[:])
    return g_ref[:] * (jnp.where(cols == y_ref[:], 1.0, 0.0) - p)


def _bwd_dx_kernel(x_ref, w_ref, y_ref, lse_ref, g_ref, dx_ref,
                   *, block_v, vocab, precision):
    iv = pl.program_id(1)

    @pl.when(iv == 0)
    def _():
        dx_ref[:] = jnp.zeros_like(dx_ref)

    dl = _dl_tile(x_ref, w_ref, y_ref, lse_ref, g_ref, iv, block_v, vocab,
                  precision)
    w = w_ref[:]
    # (BM, BV) @ (H, BV)^T -> (BM, H)
    dx_ref[:] = dx_ref[:] + _dot(dl.astype(w.dtype), w, ((1,), (1,)),
                                 precision)


def _bwd_dw_kernel(x_ref, w_ref, y_ref, lse_ref, g_ref, dw_ref,
                   *, block_v, vocab, precision):
    iv = pl.program_id(0)
    im = pl.program_id(1)

    @pl.when(im == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    dl = _dl_tile(x_ref, w_ref, y_ref, lse_ref, g_ref, iv, block_v, vocab,
                  precision)
    x = x_ref[:]
    # (BM, H)^T @ (BM, BV) -> (H, BV)
    dw_ref[:] = dw_ref[:] + _dot(x, dl.astype(x.dtype), ((0,), (0,)),
                                 precision)


def _bwd(x, w, y, lse, g, bm, bv_dx, bv_dw, precision, interpret):
    lse2 = lse[:, None] if lse.ndim == 1 else lse
    g2 = g[:, None].astype(jnp.float32)
    y2 = y[:, None]
    (x, y2, lse2, g2), M_true = _pad_rows((x, y2, lse2, g2), bm)
    M, H = x.shape
    V = w.shape[1]

    def small_specs(index_map):
        return [
            pl.BlockSpec((bm, 1), index_map, memory_space=pltpu.VMEM)
            for _ in range(3)
        ]

    bv = bv_dx
    n_v = pl.cdiv(V, bv)
    w_p = jnp.pad(w, ((0, 0), (0, n_v * bv - V))) if n_v * bv != V else w
    dx = pl.pallas_call(
        functools.partial(_bwd_dx_kernel, block_v=bv, vocab=V,
                          precision=precision),
        grid=(M // bm, n_v),
        in_specs=[
            pl.BlockSpec((bm, H), lambda m, v: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, bv), lambda m, v: (0, v),
                         memory_space=pltpu.VMEM),
            *small_specs(lambda m, v: (m, 0)),
        ],
        out_specs=pl.BlockSpec((bm, H), lambda m, v: (m, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, H), jnp.float32),
        interpret=interpret,
    )(x, w_p, y2, lse2, g2)

    bv = bv_dw
    n_v = pl.cdiv(V, bv)
    vpad = n_v * bv
    w_p = jnp.pad(w, ((0, 0), (0, vpad - V))) if vpad != V else w
    dw = pl.pallas_call(
        functools.partial(_bwd_dw_kernel, block_v=bv, vocab=V,
                          precision=precision),
        grid=(n_v, M // bm),
        in_specs=[
            pl.BlockSpec((bm, H), lambda v, m: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, bv), lambda v, m: (0, v),
                         memory_space=pltpu.VMEM),
            *small_specs(lambda v, m: (m, 0)),
        ],
        out_specs=pl.BlockSpec((H, bv), lambda v, m: (0, v),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, vpad), jnp.float32),
        interpret=interpret,
    )(x, w_p, y2, lse2, g2)
    if vpad != V:
        dw = dw[:, :V]
    return dx[:M_true].astype(x.dtype), dw.astype(w.dtype)


# ---------------------------------------------------------------- public


def _run_fwd(x, w, y, blocks, precision, interpret):
    bm_f, bv_f, bh_f, _, _, _ = blocks
    if bh_f:
        return _fwd_hblocked(x, w, y, bm_f, bv_f, bh_f, precision, interpret)
    return _fwd(x, w, y, bm_f, bv_f, precision, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused(x, w, y, blocks, precision, interpret):
    logp, _ = _run_fwd(x, w, y, blocks, precision, interpret)
    return logp


def _fused_fwd(x, w, y, blocks, precision, interpret):
    logp, lse = _run_fwd(x, w, y, blocks, precision, interpret)
    return logp, (x, w, y, lse)


def _fused_bwd(blocks, precision, interpret, res, g):
    _, _, _, bm_b, bv_dx, bv_dw = blocks
    x, w, y, lse = res
    dx, dw = _bwd(x, w, y, lse, g, bm_b, bv_dx, bv_dw, precision, interpret)
    return dx, dw, None


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_target_logp(
    hidden: Array,  # (..., H) activations at positions that predict `labels`
    w: Array,  # (H, V) lm_head kernel
    labels: Array,  # (...,) int32 target ids (invalid rows: any id in range)
    *,
    block_m: Optional[int] = None,
    block_v: Optional[int] = None,
    block_h: Optional[int] = None,
    interpret: bool = False,
) -> Array:
    """-> (...,) fp32 log p(labels) = logit[label] - logsumexp(logits).

    Differentiable wrt hidden and w; never materializes the (..., V) logits.
    Rows whose label position is masked upstream still compute (cheap), the
    caller zeroes them — same contract as get_batch_logps.

    Above _FWD_HBLOCK_THRESHOLD the forward streams H in block_h chunks so
    the row/vocab tiles stay MXU-sized (at H=4096 the single-pass solver
    collapses to 256x128); each kernel pads rows to its own block size, so
    forward-only users (the scoring pass) are not constrained by the
    backward's tighter VMEM budget.
    """
    batch_shape = hidden.shape[:-1]
    H = hidden.shape[-1]
    V = w.shape[1]
    x = hidden.reshape(-1, H)
    y = labels.reshape(-1).astype(jnp.int32)
    M = x.shape[0]

    i = x.dtype.itemsize
    if block_h is None and H > _FWD_HBLOCK_THRESHOLD:
        block_h = _FWD_BLOCK_H
    if block_h:
        bm_f, bv_f = _fwd_blocks_hblocked(M, V, block_h, i)
        bh_f = block_h
    else:
        bm_f, bv_f = _fwd_blocks(M, H, V, i)
        bh_f = 0
    bm_dx, bv_dx = _dx_blocks(M, H, V, i)
    bm_dw, bv_dw = _dw_blocks(M, H, V, i)
    bm_b = min(bm_dx, bm_dw)
    if block_m:
        bm_f = bm_b = block_m
    if block_v:
        bv_f = bv_dx = bv_dw = block_v

    precision = (
        jax.lax.Precision.HIGHEST
        if x.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    out = _fused(
        x, w, y, (bm_f, bv_f, bh_f, bm_b, bv_dx, bv_dw), precision, interpret
    )
    return out.reshape(batch_shape)


def target_logp_xla(hidden: Array, w: Array, labels: Array) -> Array:
    """Reference/fallback path: same math through XLA (materializes logits)."""
    logits = hidden @ w.astype(hidden.dtype)
    lse = jax.scipy.special.logsumexp(logits.astype(jnp.float32), axis=-1)
    tgt = jnp.take_along_axis(
        logits, labels[..., None].astype(jnp.int32), axis=-1
    )[..., 0]
    return tgt.astype(jnp.float32) - lse
