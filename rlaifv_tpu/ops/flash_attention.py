"""Pallas TPU flash attention (training path): blocked-q, resident-KV.

TPU-native replacement for the flash-attention CUDA kernel the reference
requests (muffin/train/train_llava15.py:338). Design, per the TPU memory
hierarchy (pallas_guide.md):

- grid (B, H, Lq/BQ): each program streams one q block from HBM into VMEM
  and keeps the full K/V for its (batch, kv-head) resident in VMEM —
  RLAIF-V sequences are <= 2048+576 tokens, so K,V in bf16 occupy ~1.3 MB:
  far under the 16 MB VMEM budget and cheaper than online-softmax streaming.
- the resident K is scored in ONE (BQ, L) matmul per program, deliberately
  NOT chunked with causal FLOP skipping: a chunked online-softmax variant
  (block_q-sized K chunks, fori_loop stopping at the diagonal) was built
  and measured slower on v5e despite ~2x fewer scored keys — 3.12 vs 2.76
  ms fwd+bwd at B=16 L=1024 H=12 D=128, 4.96 vs 4.36 ms at B=8 L=2048:
  small (BQ x BQ x 128) matmuls under a dynamic loop forfeit MXU utilization
  and Mosaic pipelining worth more than the masked-out FLOPs at these
  lengths. Revisit only if sequence lengths grow past ~4k.
- scores/softmax accumulate in fp32 on the MXU (preferred_element_type),
  outputs cast back to the activation dtype. fp32 inputs additionally pin
  Precision.HIGHEST: the TPU default for fp32 matmuls is a single bf16
  pass (~1e-2 abs error at these shapes); HIGHEST brings fwd parity vs an
  exact oracle to ~1e-6. bf16 training inputs keep DEFAULT — no cost.
- GQA without materializing repeated heads: the k/v BlockSpec index map
  folds the q-head -> kv-head mapping (h // n_rep).
- backward is the standard two-kernel flash split: dq over q blocks, dk/dv
  over k blocks, both recomputing probabilities from the saved row
  logsumexp; D = rowsum(dO*O) is a cheap XLA fusion outside the kernels.

Masking: causal (absolute positions) + optional key padding mask, additive
-1e30 in fp32. Rows that are fully masked produce zeros (not NaN).
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
# 512 measured fastest at training lengths (fwd+bwd, v5e): 2.21 vs 2.44 ms
# at B=16 L=1024, 3.82 vs 4.07 at B=8 L=2048 vs block 256 — bigger q blocks
# amortize per-program overhead and keep the (BQ, L) score matmul MXU-fat.
# The dkv kernel (block_k = block_q, full-Lq resident) still fits VMEM at
# L=2048; lengths that 512/256 don't divide fall back to 128 (e.g. 2624).
DEFAULT_BLOCK_Q = 512


def _interpret() -> bool:
    """Interpret off-TPU so the same kernels run (slowly) in CPU CI — the
    in-suite contract gate between tunnel windows; compiled execution is
    still validated by tests/run_tpu_checks.py on hardware."""
    import jax

    return jax.default_backend() != "tpu"


def _pick_block_q(L: int) -> Optional[int]:
    for b in (DEFAULT_BLOCK_Q, 256, 128):
        if L % b == 0:
            return b
    return None


# ---------------------------------------------------------------- forward


def _fwd_kernel(mask_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, block_q,
                causal, precision, q_offset=0):
    iq = pl.program_id(2)
    q = q_ref[0, 0].astype(jnp.float32)  # (BQ, D)
    k = k_ref[0, 0].astype(jnp.float32)  # (L, D)
    L = k.shape[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=precision
    ) * scale  # (BQ, L)

    kpos = jax.lax.broadcasted_iota(jnp.int32, (block_q, L), 1)
    bias = jnp.where(mask_ref[0, 0] != 0, 0.0, NEG_INF)[None, :]
    if causal:
        # q_offset: static absolute position of q row 0 (rectangular
        # shared-prefix attention — queries are the suffix window, keys the
        # full prefix+suffix sequence)
        qpos = q_offset + iq * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, L), 0
        )
        bias = bias + jnp.where(kpos <= qpos, 0.0, NEG_INF)
    s = s + bias

    m = jnp.max(s, axis=1, keepdims=True)
    # guard fully-masked rows
    m_safe = jnp.maximum(m, NEG_INF / 2)
    p = jnp.exp(s - m_safe)
    l = jnp.sum(p, axis=1, keepdims=True)
    p = p / jnp.maximum(l, 1e-30)

    v = v_ref[0, 0].astype(jnp.float32)
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=precision
    )
    o_ref[0, 0] = o.astype(o_ref.dtype)
    lse = m_safe[:, 0] + jnp.log(jnp.maximum(l[:, 0], 1e-30))
    lse_ref[:, :] = jnp.broadcast_to(lse[None, :], lse_ref.shape)


def _fwd(q, k, v, mask, scale, causal, block_q, q_offset=0):
    B, H, Lq, D = q.shape
    KVH, Lk = k.shape[1], k.shape[2]
    n_rep = H // KVH
    grid = (B, H, Lq // block_q)

    precision = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    kernel = functools.partial(
        _fwd_kernel, scale=scale, block_q=block_q, causal=causal,
        precision=precision, q_offset=q_offset,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, Lk), lambda b, h, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Lk, D), lambda b, h, i: (b, h // n_rep, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Lk, D), lambda b, h, i: (b, h // n_rep, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, 8, block_q), lambda b, h, i: (b, h, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Lq, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, 8, Lq), jnp.float32),
        ],
        interpret=_interpret(),
    )(mask[:, None, :], q, k, v)
    return out, lse


# ---------------------------------------------------------------- backward


def _bwd_dq_kernel(mask_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                   dq_ref, *, scale, block_q, causal, precision, q_offset=0):
    iq = pl.program_id(2)
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    L = k.shape[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=precision
    ) * scale
    kpos = jax.lax.broadcasted_iota(jnp.int32, (block_q, L), 1)
    bias = jnp.where(mask_ref[0, 0] != 0, 0.0, NEG_INF)[None, :]
    if causal:
        qpos = q_offset + iq * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, L), 0
        )
        bias = bias + jnp.where(kpos <= qpos, 0.0, NEG_INF)
    p = jnp.exp(s + bias - lse_ref[0, :][:, None])

    do = do_ref[0, 0].astype(jnp.float32)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=precision
    )
    ds = p * (dp - delta_ref[0, :][:, None]) * scale
    dq = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=precision
    )
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(mask_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, dk_acc, dv_acc, *, scale, block_k, causal,
                    n_rep, precision, q_offset=0):
    # this program owns one k block for one *kv* head and ONE of the n_rep
    # q heads mapped onto it (the rep axis is the innermost grid dim, so a
    # k block's rep sweep runs back-to-back). A python rep loop instead
    # multiplies live (Lq, BK) temporaries by n_rep and VMEM-OOMs at GQA
    # training lengths (measured: n_rep=4, Lq=512 blows the 16M scoped
    # limit); f32 VMEM scratch carries the accumulation across reps at
    # MHA-identical per-program cost.
    ik = pl.program_id(2)
    ir = pl.program_id(3)
    k = k_ref[0, 0].astype(jnp.float32)  # (BK, D)
    v = v_ref[0, 0].astype(jnp.float32)
    Lq = q_ref.shape[3]
    BK, D = k.shape

    kpos = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, (Lq, BK), 1)
    qpos = q_offset + jax.lax.broadcasted_iota(jnp.int32, (Lq, BK), 0)
    bias = jnp.where(mask_ref[0, 0] != 0, 0.0, NEG_INF)[None, :]
    if causal:
        bias = bias + jnp.where(kpos <= qpos, 0.0, NEG_INF)

    q = q_ref[0, 0, 0].astype(jnp.float32)  # (Lq, D)
    do = do_ref[0, 0, 0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=precision
    ) * scale  # (Lq, BK)
    p = jnp.exp(s + bias - lse_ref[0, 0, :][:, None])
    dv = jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=precision
    )
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=precision
    )
    ds = p * (dp - delta_ref[0, 0, :][:, None]) * scale
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=precision
    )

    @pl.when(ir == 0)
    def _init():
        dk_acc[...] = dk
        dv_acc[...] = dv

    @pl.when(ir != 0)
    def _accum():
        dk_acc[...] += dk
        dv_acc[...] += dv

    @pl.when(ir == n_rep - 1)
    def _flush():
        dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _bwd(scale, causal, block_q, q_offset, res, g):
    q, k, v, mask, out, lse = res
    do, _ = g
    B, H, Lq, D = q.shape
    KVH, Lk = k.shape[1], k.shape[2]
    n_rep = H // KVH

    delta = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )  # (B, H, Lq)
    delta = jnp.broadcast_to(delta[:, :, None, :], (B, H, 8, Lq))
    # 8-sublane row layout, matching lse (a trailing unit dim would be
    # lane-padded to 128 — 128x the memory at 7B geometry)
    mask3 = mask[:, None, :]  # (B, 1, Lk)

    precision = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    dq_kernel = functools.partial(
        _bwd_dq_kernel, scale=scale, block_q=block_q, causal=causal,
        precision=precision, q_offset=q_offset,
    )
    dq = pl.pallas_call(
        dq_kernel,
        grid=(B, H, Lq // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, Lk), lambda b, h, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Lk, D), lambda b, h, i: (b, h // n_rep, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Lk, D), lambda b, h, i: (b, h // n_rep, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, 8, block_q), lambda b, h, i: (b, h, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, 8, block_q), lambda b, h, i: (b, h, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Lq, D), q.dtype),
        interpret=_interpret(),
    )(mask3, q, k, v, do, lse, delta)

    block_k = block_q
    # group q-heads by kv head for the dkv kernel: (B, KVH, n_rep, Lq, D)
    qg = q.reshape(B, KVH, n_rep, Lq, D)
    dog = do.reshape(B, KVH, n_rep, Lq, D)
    lseg = lse.reshape(B, KVH, n_rep, 8, Lq)
    deltag = delta.reshape(B, KVH, n_rep, 8, Lq)

    dkv_kernel = functools.partial(
        _bwd_dkv_kernel, scale=scale, block_k=block_k, causal=causal,
        n_rep=n_rep, precision=precision, q_offset=q_offset,
    )
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(B, KVH, Lk // block_k, n_rep),
        in_specs=[
            pl.BlockSpec((1, 1, block_k), lambda b, h, i, r: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, Lq, D), lambda b, h, i, r: (b, h, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, r: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, r: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, Lq, D), lambda b, h, i, r: (b, h, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, 1, 8, Lq),
                         lambda b, h, i, r: (b, h, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, 1, 8, Lq),
                         lambda b, h, i, r: (b, h, r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, r: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, i, r: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, KVH, Lk, D), k.dtype),
            jax.ShapeDtypeStruct((B, KVH, Lk, D), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, D), jnp.float32),
            pltpu.VMEM((block_k, D), jnp.float32),
        ],
        interpret=_interpret(),
    )(mask3, qg, k, v, dog, lseg, deltag)

    # reshape dkv kernel views back; mask grad is None
    return dq, dk, dv, None


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash(q, k, v, mask, scale, causal, block_q, q_offset):
    out, _ = _fwd(q, k, v, mask, scale, causal, block_q, q_offset)
    return out


def _flash_fwd(q, k, v, mask, scale, causal, block_q, q_offset):
    out, lse = _fwd(q, k, v, mask, scale, causal, block_q, q_offset)
    return out, (q, k, v, mask, out, lse)


def _flash_bwd(scale, causal, block_q, q_offset, res, g):
    return _bwd(scale, causal, block_q, q_offset, res, (g, None))


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: Array,
    k: Array,
    v: Array,
    *,
    attention_mask: Optional[Array] = None,
    causal: bool = True,
    q_offset: int = 0,
) -> Array:
    """q (B, Lq, H, D); k/v (B, Lk, KVH, D) — KVH divides H. Returns
    (B, Lq, H, D).

    attention_mask: (B, Lk) key validity (1 = attend). q_offset (STATIC
    int): absolute position of q row 0 — the rectangular shared-prefix
    case (queries = suffix window at positions [q_offset, q_offset+Lq),
    keys = the full prefix+suffix sequence).

    Arbitrary (non-128-aligned) causal lengths ride the kernel via
    transparent padding: key pads are masked out (exact), padded query
    rows are sliced off (the slice vjp zeroes their cotangent, so their
    dk/dv contribution is exactly 0). Real shared prefixes (P = prompt
    length, e.g. 601) need this — no alignment cooperates with them.
    """
    B, Lq, H, D = q.shape
    Lk, KVH = k.shape[1], k.shape[2]
    pad_q = (-Lq) % 128
    pad_k = (-Lk) % 128
    if causal and (pad_q or pad_k) and (Lq == Lk or q_offset > 0):
        if attention_mask is None:
            attention_mask = jnp.ones((B, Lk), jnp.int32)
        out = flash_attention(
            jnp.pad(q, ((0, 0), (0, pad_q), (0, 0), (0, 0))),
            jnp.pad(k, ((0, 0), (0, pad_k), (0, 0), (0, 0))),
            jnp.pad(v, ((0, 0), (0, pad_k), (0, 0), (0, 0))),
            attention_mask=jnp.pad(
                attention_mask.astype(jnp.int32), ((0, 0), (0, pad_k))
            ),
            causal=True,
            q_offset=q_offset,
        )
        return out[:, :Lq]

    block_q = None
    for b in (DEFAULT_BLOCK_Q, 256, 128):
        if Lq % b == 0 and Lk % b == 0:
            block_q = b
            break
    rect_ok = q_offset > 0 and block_q is not None
    if block_q is None or (Lq != Lk and not rect_ok):
        from rlaifv_tpu.ops.attention import _build_bias, dense_attention, repeat_kv

        n_rep = H // KVH
        bias = _build_bias(Lq, Lk, attention_mask, causal,
                           q_offset if q_offset else None, B)
        return dense_attention(q, repeat_kv(k, n_rep), repeat_kv(v, n_rep), bias)

    if attention_mask is None:
        attention_mask = jnp.ones((B, Lk), jnp.int32)
    attention_mask = attention_mask.astype(jnp.int32)

    scale = 1.0 / (D ** 0.5)
    qt = q.transpose(0, 2, 1, 3)  # (B, H, Lq, D)
    kt = k.transpose(0, 2, 1, 3)  # (B, KVH, Lk, D)
    vt = v.transpose(0, 2, 1, 3)
    out = _flash(qt, kt, vt, attention_mask, scale, causal, block_q,
                 int(q_offset))
    return out.transpose(0, 2, 1, 3)
