"""Attention dispatch: Pallas flash kernel on TPU, fused jnp path elsewhere.

Replaces the reference's flash-attention CUDA dependency
(ref: muffin/train/train_llava15.py:338 requests flash_attention_2;
llava/model/builder.py:45-46). One entry point serves training (no cache,
causal over the padded batch) and decode (single-step queries against a
static KV cache).

Layout convention: q (B, Lq, H, D); k/v (B, Lk, KVH, D) with KVH dividing H
(grouped-query attention). Masks are additive -inf in fp32; softmax always
accumulates in fp32 regardless of activation dtype (bf16 inputs are fine for
the MXU matmuls on TPU).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

_NEG_INF = -1e30  # finite -inf stand-in keeps fully-masked rows NaN-free


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def repeat_kv(x: Array, n_rep: int) -> Array:
    """(B, L, KVH, D) -> (B, L, KVH*n_rep, D) duplicating each kv head."""
    if n_rep == 1:
        return x
    B, L, KVH, D = x.shape
    x = jnp.broadcast_to(x[:, :, :, None, :], (B, L, KVH, n_rep, D))
    return x.reshape(B, L, KVH * n_rep, D)


def _build_bias(
    Lq: int,
    Lk: int,
    attention_mask: Optional[Array],
    causal: bool,
    q_offset: Optional[Array],
    batch: int,
) -> Optional[Array]:
    """Additive bias (B, 1, Lq, Lk) or None when nothing is masked."""
    bias = None
    if causal:
        q_pos = jnp.arange(Lq, dtype=jnp.int32)[:, None]
        if q_offset is not None:
            q_pos = q_pos + q_offset
        k_pos = jnp.arange(Lk, dtype=jnp.int32)[None, :]
        causal_bias = jnp.where(k_pos <= q_pos, 0.0, _NEG_INF).astype(jnp.float32)
        bias = causal_bias[None, None]  # (1,1,Lq,Lk)
    if attention_mask is not None:
        pad = jnp.where(attention_mask.astype(bool), 0.0, _NEG_INF).astype(
            jnp.float32
        )
        pad = pad[:, None, None, :]  # (B,1,1,Lk)
        bias = pad if bias is None else bias + pad
    return bias


def dense_attention(
    q: Array,
    k: Array,
    v: Array,
    bias: Optional[Array],
) -> Array:
    """Reference jnp attention; XLA fuses the softmax chain."""
    D = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(D, jnp.float32))
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if bias is not None:
        scores = scores + bias
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def multi_head_attention(
    q: Array,
    k: Array,
    v: Array,
    *,
    attention_mask: Optional[Array] = None,
    causal: bool = True,
    q_offset: Optional[Array] = None,
    impl: str = "auto",
) -> Array:
    """Grouped-query attention. Returns (B, Lq, H, D).

    impl: "auto" picks the Pallas flash kernel on TPU for long-enough
    sequences, the dense path otherwise; "flash"/"dense" force a path.
    """
    B, Lq, H, D = q.shape
    Lk = k.shape[1]

    # a STATIC (Python int) q_offset can ride the flash kernel — the
    # rectangular shared-prefix training path (suffix queries over
    # prefix+suffix keys). Traced offsets (decode cache_index) cannot.
    static_off = isinstance(q_offset, int)
    use_flash = impl == "flash" or (
        impl == "auto" and _on_tpu() and Lq >= 128 and D <= 256
        and (q_offset is None or static_off)
        and (Lq == Lk or (static_off and q_offset + Lq == Lk))
    )
    if use_flash:
        if q_offset is not None and not static_off:
            # only reachable with impl="flash" forced: the kernel needs a
            # compile-time offset for its causal mask; silently zeroing a
            # traced one (decode cache_index) would mis-mask every row
            raise ValueError(
                "impl='flash' requires a static (Python int) q_offset; got "
                f"a traced {type(q_offset).__name__} — use impl='auto' (it "
                "falls back to dense/decode for traced offsets)"
            )
        from rlaifv_tpu.ops.flash_attention import flash_attention

        return flash_attention(
            q, k, v, attention_mask=attention_mask, causal=causal,
            q_offset=q_offset if static_off else 0,
        )

    use_decode = impl == "decode" or (
        impl == "auto"
        and _on_tpu()
        and Lq == 1
        and q_offset is not None
        and attention_mask is not None
        and D <= 256
        and Lk % 128 == 0
    )
    if use_decode:
        # single-token decode over a static cache: the Pallas prefix kernel
        # reads only live columns [0, cache_index] — HBM traffic tracks the
        # generated length, not max_len (measured 2.7x dense at 1/7 prefix,
        # parity at full length; ops/decode_attention.py).
        from rlaifv_tpu.ops.decode_attention import decode_attention_prefix

        out = decode_attention_prefix(
            q[:, 0], k, v, attention_mask, jnp.asarray(q_offset) + 1
        )
        return out[:, None]

    n_rep = H // k.shape[2]
    k = repeat_kv(k, n_rep)
    v = repeat_kv(v, n_rep)
    bias = _build_bias(Lq, Lk, attention_mask, causal, q_offset, B)
    return dense_attention(q, k, v, bias)
