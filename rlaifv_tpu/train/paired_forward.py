"""Shared-prefix paired forward for DPO training.

Win and rej rows of a DPO pair share the entire prompt (system + image
tokens + question); they differ only in the answer suffix. The reference
runs the full concatenated (2B, L) forward, paying the prompt twice per
pair (muffin/train/trainers.py:188-205 — `torch.cat` of win/rej rows,
one full-length forward). Here the pair is computed ONCE where it is
shared:

  prefix  (B, Pa): one causal self-attention pass per PAIR, at the
                   128-ALIGNED array length Pa = ceil128(P) (pad rows
                   masked + discarded — an unaligned P compiled but cost
                   +5.2G of materialized pad/slice temps around every
                   kernel at 7B, measured)
  suffix (2B, W):  queries attend over [tiled prefix KV ; own suffix KV]
                   with a static q_offset=Pa (rectangular flash kernel,
                   ops/flash_attention.py); W may TRIM the padded tail to
                   ~answer length — exact, since causal logps of kept
                   positions never depend on dropped later tokens

Per-pair token work drops from 2L to Pa + 2W; at L=2048, P=601, W=384
(256-token answers) that is a 2.9x cut on the linear layers and more on
attention. The math is exactly the full forward's: causal attention makes
prefix activations independent of the suffix, RoPE positions are absolute
(prefix arange(Pa), suffix P+arange(W) — REAL positions even when Pa>P),
and the merged key set per suffix query equals the full sequence's
visible set.

The module classes MIRROR models/llama.py's param structure (same module
names at the same nesting), so the same checkpoints, int8 QuantDense
kernels, and LoRA collections apply unchanged — flax fails loudly on any
path mismatch, and tests/test_paired_prefix.py pins loss+grad parity vs
the plain concatenated forward for every hparam variant.

Remat unit = the PAIR: one PairedBlock remat cell holds (x_p, x_s) as its
residual inputs — smaller than the plain path's (2B, L) per-layer x —
while the merged (2B, P+W) KV exists only transiently inside the cell.
Wrapping prefix and suffix as separate remat cells would instead pin every
layer's merged KV as a backward residual (~8.6 GB at 7B, measured
unworkable).
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from rlaifv_tpu.models.llama import (
    LlamaConfig,
    LlamaMLP,
    RMSNorm,
    _dense,
    apply_rope,
    rope_cos_sin,
)
from rlaifv_tpu.ops.attention import multi_head_attention

Array = jax.Array


class PairedLlamaAttention(nn.Module):
    """LlamaAttention's params, applied to a (prefix, suffix) pair."""

    cfg: LlamaConfig

    @nn.compact
    def __call__(self, xp, xs, cosp, sinp, coss, sins, pmask, smask):
        cfg = self.cfg
        B, P, _ = xp.shape
        S, W, _ = xs.shape  # S = 2B (win rows then rej rows)
        H, KVH, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_size

        if cfg.fuse_proj:
            qkv_d = _dense((H + 2 * KVH) * D, cfg, ("embed", "qkv"),
                           "qkv_proj")

            def qkv(x):
                t = qkv_d(x)
                return (t[..., : H * D],
                        t[..., H * D : (H + KVH) * D],
                        t[..., (H + KVH) * D :])
        else:
            q_d = _dense(H * D, cfg, ("embed", "qkv"), "q_proj")
            k_d = _dense(KVH * D, cfg, ("embed", "qkv"), "k_proj")
            v_d = _dense(KVH * D, cfg, ("embed", "qkv"), "v_proj")

            def qkv(x):
                return q_d(x), k_d(x), v_d(x)

        qp, kp, vp = qkv(xp)
        qs, ks, vs = qkv(xs)
        qp = apply_rope(qp.reshape(B, P, H, D), cosp, sinp)
        kp = apply_rope(kp.reshape(B, P, KVH, D), cosp, sinp)
        vp = vp.reshape(B, P, KVH, D)
        qs = apply_rope(qs.reshape(S, W, H, D), coss, sins)
        ks = apply_rope(ks.reshape(S, W, KVH, D), coss, sins)
        vs = vs.reshape(S, W, KVH, D)

        # prefix: ordinary causal self-attention, ONE row per pair
        op = multi_head_attention(
            qp, kp, vp, attention_mask=pmask, causal=True,
            impl=cfg.attn_impl,
        )
        # suffix: queries at absolute positions [P, P+W) over the merged
        # [tiled prefix KV ; suffix KV] — row b and row B+b share prefix b
        kf = jnp.concatenate([jnp.concatenate([kp, kp], 0), ks], axis=1)
        vf = jnp.concatenate([jnp.concatenate([vp, vp], 0), vs], axis=1)
        os_ = multi_head_attention(
            qs, kf, vf, attention_mask=smask, causal=True, q_offset=P,
            impl=cfg.attn_impl,
        )

        o_d = _dense(cfg.hidden_size, cfg, ("qkv", "embed"), "o_proj")
        return o_d(op.reshape(B, P, H * D)), o_d(os_.reshape(S, W, H * D))


class PairedLlamaBlock(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(self, xp, xs, cosp, sinp, coss, sins, pmask, smask):
        cfg = self.cfg
        ln_attn = RMSNorm(cfg.rms_norm_eps, cfg.param_dtype, name="ln_attn")
        ap, as_ = PairedLlamaAttention(cfg, name="attn")(
            ln_attn(xp), ln_attn(xs), cosp, sinp, coss, sins, pmask, smask
        )
        xp = xp + ap
        xs = xs + as_
        ln_mlp = RMSNorm(cfg.rms_norm_eps, cfg.param_dtype, name="ln_mlp")
        mlp = LlamaMLP(cfg, name="mlp")
        xp = xp + mlp(ln_mlp(xp))
        xs = xs + mlp(ln_mlp(xs))
        return xp, xs


class PairedLlamaModel(nn.Module):
    """LlamaModel's params, run as the shared-prefix paired forward.

    Apply with the SAME params subtree as models.llama.LlamaModel
    (`params['llm']['model']` for LLaVA) — module names mirror exactly.
    Returns (prefix_hidden (B, P, D), suffix_hidden (2B, W, D)), both
    post-ln_f (ln_f is per-position, so split application == full)."""

    cfg: LlamaConfig

    def setup(self):
        cfg = self.cfg
        self.tok_embed = nn.Embed(
            cfg.vocab_size,
            cfg.hidden_size,
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            embedding_init=nn.initializers.normal(0.02),
        )
        block = PairedLlamaBlock
        if cfg.remat:
            # same rationale as LlamaModel.setup: prevent_cse=True is
            # mandatory with unrolled layers
            block = nn.remat(
                PairedLlamaBlock,
                static_argnums=(),
                prevent_cse=True,
                policy=jax.checkpoint_policies.nothing_saveable,
            )
        self.blocks = [block(cfg, name=f"layer_{i}")
                       for i in range(cfg.num_layers)]
        self.ln_f = RMSNorm(cfg.rms_norm_eps, cfg.param_dtype, name="ln_f")

    def embed(self, input_ids: Array) -> Array:
        from rlaifv_tpu.models.llama import _embed_lookup

        return _embed_lookup(self.tok_embed, input_ids, self.cfg.dtype)

    def __call__(
        self,
        prefix_embeds: Array,  # (B, Pa, D) — vision already spliced
        suffix_embeds: Array,  # (2B, W, D)
        prefix_mask: Optional[Array] = None,  # (B, Pa) key validity
        suffix_mask: Optional[Array] = None,  # (2B, Pa+W) key validity
        suffix_pos_start: Optional[int] = None,  # REAL position of suffix
        # token 0 (static). When the array prefix is padded to an aligned
        # Pa > real P, RoPE must still use real positions: prefix rows get
        # arange(Pa) (pad rows masked, values discarded), suffix rows get
        # suffix_pos_start + arange(W). Defaults to Pa (unpadded case).
    ) -> Tuple[Array, Array]:
        cfg = self.cfg
        B, P, _ = prefix_embeds.shape
        S, W, _ = suffix_embeds.shape
        if S != 2 * B:
            raise ValueError(f"suffix rows ({S}) must be 2x prefix rows ({B})")
        pos0 = P if suffix_pos_start is None else int(suffix_pos_start)

        pos_p = jnp.broadcast_to(
            jnp.arange(P, dtype=jnp.int32)[None, :], (B, P)
        )
        pos_s = jnp.broadcast_to(
            (pos0 + jnp.arange(W, dtype=jnp.int32))[None, :], (S, W)
        )
        cosp, sinp = rope_cos_sin(pos_p, cfg.head_size, cfg.rope_theta,
                                  cfg.dtype)
        coss, sins = rope_cos_sin(pos_s, cfg.head_size, cfg.rope_theta,
                                  cfg.dtype)

        # Pin both streams to batch-over-(dp,fsdp) at every layer boundary:
        # GSPMD propagation otherwise infers a (dp, ., tp)-sharded layout
        # for the suffix stream (the tiled-prefix KV concat in the merged
        # attention confuses it) and inserts a replicate-then-repartition
        # before each MLP matmul (XLA "involuntary full rematerialization").
        from rlaifv_tpu.parallel.sharding import pin_batch_activation

        xp, xs = pin_batch_activation(prefix_embeds), pin_batch_activation(
            suffix_embeds
        )
        for blk in self.blocks:
            xp, xs = blk(xp, xs, cosp, sinp, coss, sins,
                         prefix_mask, suffix_mask)
            xp, xs = pin_batch_activation(xp), pin_batch_activation(xs)
        return self.ln_f(xp), self.ln_f(xs)


def merge_paired_hidden(
    prefix_hidden: Array, suffix_hidden: Array, real_prefix_len: int = 0
) -> Array:
    """(B, Pa, D) + (2B, W, D) -> the (2B, P+W, D) hidden layout the
    logp/head code expects (win rows then rej rows, prefix tiled).
    real_prefix_len (static) drops alignment-pad prefix rows first."""
    if real_prefix_len and real_prefix_len != prefix_hidden.shape[1]:
        prefix_hidden = prefix_hidden[:, :real_prefix_len]
    tiled = jnp.concatenate([prefix_hidden, prefix_hidden], axis=0)
    return jnp.concatenate([tiled, suffix_hidden], axis=1)
