"""EVA02/EVA-CLIP ViT family in flax — OmniLMM-12B's vision tower.

Rebuild of the timm dependency (ref: omnilmm/model/omnilmm.py:31-52 creates
`eva02_enormous_patch14_clip_224` with dynamic_img_size and replaces the
last block with Identity — i.e. the 2nd-last layer's features feed the
resampler; prefix/cls tokens are stripped by the caller,
omnilmm.py:107-121).

The Eva block family is flag-configurable (timm models this the same way):
- use_rope:    2D axial rotary embedding on q/k (EVA02 S/B/L)
- use_swiglu:  SwiGLU FFN with optional inner LayerNorm (subln)
- qkv_fused:   one packed qkv projection vs separate q/k/v
- use_post_norm: post-norm residual placement (EVA-CLIP giants)
The `enormous()` preset uses the plain pre-norm/fused-qkv/GELU configuration
of the EVA-CLIP-E tower; flag values are validated against real converted
weights (weight-level parity gate deferred until checkpoints are on disk).

Dynamic image size: position embeddings are bicubic-resized on the fly
(ref resampler.py:23-39 pattern), so any H×W divisible by patch works.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from rlaifv_tpu.models.resampler import interp_abs_pos

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class EvaConfig:
    image_size: int = 224
    patch_size: int = 14
    embed_dim: int = 1792
    depth: int = 64
    num_heads: int = 16
    mlp_hidden: int = 15360
    use_rope: bool = False
    use_swiglu: bool = False
    subln: bool = False
    qkv_fused: bool = True
    use_post_norm: bool = False
    ln_eps: float = 1e-6
    num_prefix_tokens: int = 1  # cls token
    quantize: bool = False  # weight-only int8 projections (QuantDense):
    # EVA02-enormous bf16 is 8.8G — int8 (4.4G) is what lets the 12B
    # OmniLMM serve next to its int8 LM on one 16G chip
    quantize_bits: int = 8  # 4 = nibble-packed int4 + group scales (2.2G tower):
    # vision prefill is compute-bound so int4 buys MEMORY, not speed —
    # headroom for longer sequences / bigger batches beside the 12B LM
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @staticmethod
    def enormous(**kw) -> "EvaConfig":
        return EvaConfig(**kw)

    @staticmethod
    def tiny(**kw) -> "EvaConfig":
        base = dict(
            image_size=28, patch_size=7, embed_dim=32, depth=3,
            num_heads=4, mlp_hidden=64,
        )
        base.update(kw)
        return EvaConfig(**base)


def _dense(features: int, use_bias: bool, cfg: EvaConfig, name: str):
    if cfg.quantize:
        from rlaifv_tpu.models.llama import QuantDense

        return QuantDense(features, dtype=cfg.dtype, use_bias=use_bias,
                          param_dtype=cfg.param_dtype, name=name,
                          bits=getattr(cfg, "quantize_bits", 8))
    return nn.Dense(features, use_bias=use_bias, dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype, name=name)


class EvaAttention(nn.Module):
    cfg: EvaConfig

    @nn.compact
    def __call__(self, x: Array, rope: Optional[tuple]) -> Array:
        cfg = self.cfg
        B, L, D = x.shape
        H = cfg.num_heads
        hd = D // H

        if cfg.qkv_fused:
            qkv = _dense(3 * D, True, cfg, "qkv")(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            # EVA02 convention: q/v have bias, k does not
            q = _dense(D, True, cfg, "q_proj")(x)
            k = _dense(D, False, cfg, "k_proj")(x)
            v = _dense(D, True, cfg, "v_proj")(x)

        q = q.reshape(B, L, H, hd)
        k = k.reshape(B, L, H, hd)
        v = v.reshape(B, L, H, hd)

        if rope is not None:
            cos, sin = rope  # (L_patches, hd)
            npre = self.cfg.num_prefix_tokens

            def rot(t):
                tp = t[:, npre:]
                half = tp.shape[-1] // 2
                t1, t2 = tp[..., :half], tp[..., half:]
                rotated = jnp.concatenate([-t2, t1], axis=-1)
                tp = tp * cos[None, :, None, :] + rotated * sin[None, :, None, :]
                return jnp.concatenate([t[:, :npre], tp], axis=1)

            q, k = rot(q), rot(k)

        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / math.sqrt(hd)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum(
            "bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32
        ).reshape(B, L, D).astype(cfg.dtype)
        return _dense(D, True, cfg, "proj")(out)


class EvaMlp(nn.Module):
    cfg: EvaConfig

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cfg = self.cfg
        if cfg.use_swiglu:
            gate = _dense(cfg.mlp_hidden, True, cfg, "w1")(x)
            up = _dense(cfg.mlp_hidden, True, cfg, "w2")(x)
            h = nn.silu(gate) * up
            if cfg.subln:
                h = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=cfg.dtype,
                                 param_dtype=cfg.param_dtype, name="ffn_ln")(h)
            return _dense(cfg.embed_dim, True, cfg, "w3")(h)
        h = _dense(cfg.mlp_hidden, True, cfg, "fc1")(x)
        h = nn.gelu(h, approximate=False)
        return _dense(cfg.embed_dim, True, cfg, "fc2")(h)


class EvaBlock(nn.Module):
    cfg: EvaConfig

    @nn.compact
    def __call__(self, x: Array, rope) -> Array:
        cfg = self.cfg
        ln = lambda name: nn.LayerNorm(
            epsilon=cfg.ln_eps, dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, name=name,
        )
        if cfg.use_post_norm:
            x = x + ln("norm1")(EvaAttention(cfg, name="attn")(x, rope))
            x = x + ln("norm2")(EvaMlp(cfg, name="mlp")(x))
        else:
            x = x + EvaAttention(cfg, name="attn")(ln("norm1")(x), rope)
            x = x + EvaMlp(cfg, name="mlp")(ln("norm2")(x))
        return x


def rope_2d(grid_h: int, grid_w: int, head_dim: int, theta: float = 100.0):
    """EVA02 axial 2D rotary tables over the patch grid."""
    dim_half = head_dim // 2
    freqs = 1.0 / (theta ** (np.arange(0, dim_half, 2) / dim_half))
    ys, xs = np.meshgrid(np.arange(grid_h), np.arange(grid_w), indexing="ij")
    ang_y = ys.reshape(-1, 1) * freqs[None]
    ang_x = xs.reshape(-1, 1) * freqs[None]
    ang = np.concatenate([ang_y, ang_x], axis=1)  # (L, dim_half)
    emb = np.concatenate([ang, ang], axis=1)
    return jnp.asarray(np.cos(emb)), jnp.asarray(np.sin(emb))


class EvaVisionTower(nn.Module):
    """Images (B, H, W, 3) -> token features of the 2nd-last block
    (B, H/p * W/p, embed_dim), prefix tokens stripped."""

    cfg: EvaConfig

    @nn.compact
    def __call__(self, images: Array) -> Array:
        cfg = self.cfg
        B, Himg, Wimg, _ = images.shape
        gh, gw = Himg // cfg.patch_size, Wimg // cfg.patch_size

        x = nn.Conv(
            cfg.embed_dim,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            use_bias=True,
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            name="patch_embed",
        )(images.astype(cfg.dtype))
        x = x.reshape(B, gh * gw, cfg.embed_dim)

        cls_tok = self.param(
            "cls_token", nn.initializers.normal(0.02),
            (cfg.embed_dim,), cfg.param_dtype,
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_tok.astype(cfg.dtype)[None, None],
                              (B, 1, cfg.embed_dim)), x],
            axis=1,
        )

        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (cfg.grid ** 2 + cfg.num_prefix_tokens, cfg.embed_dim),
            cfg.param_dtype,
        ).astype(cfg.dtype)
        pos_prefix, pos_patch = pos[: cfg.num_prefix_tokens], pos[cfg.num_prefix_tokens:]
        if gh * gw != pos_patch.shape[0]:
            pos_patch = interp_abs_pos(pos_patch, gh * gw)
        x = x + jnp.concatenate([pos_prefix, pos_patch], axis=0)[None]

        rope = None
        if cfg.use_rope:
            rope = rope_2d(gh, gw, cfg.embed_dim // cfg.num_heads)

        # run depth-1 blocks: the last block is dead weight in the reference
        # (omnilmm.py:43 replaces blocks[-1] with Identity)
        for i in range(cfg.depth - 1):
            x = EvaBlock(cfg, name=f"block_{i}")(x, rope)

        x = nn.LayerNorm(
            epsilon=cfg.ln_eps, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            name="norm",
        )(x)
        return x[:, cfg.num_prefix_tokens:]
