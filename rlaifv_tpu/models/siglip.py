"""SigLIP vision tower in flax — MiniCPM-Llama3-V 2.5's image encoder.

The reference consumes it through MiniCPM-V remote code
(ref: minicpm-llama3-v-25/minicpmv_autocheck.py:119-134 feeds sliced images
with per-slice tgt_sizes). Architecture: patch-conv (+bias), learned
position embeddings (no CLS), pre-norm encoder blocks with gelu_tanh MLP,
final LayerNorm. Variable slice sizes are handled by bicubic re-gridding
of the position table to each (gh, gw) bucket.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from rlaifv_tpu.ops.attention import multi_head_attention

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class SiglipVisionConfig:
    image_size: int = 980
    patch_size: int = 14
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_layers: int = 27
    num_heads: int = 16
    layer_norm_eps: float = 1e-6
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @staticmethod
    def so400m(**kw) -> "SiglipVisionConfig":
        return SiglipVisionConfig(**kw)

    @staticmethod
    def tiny(**kw) -> "SiglipVisionConfig":
        base = dict(
            image_size=28, patch_size=7, hidden_size=32,
            intermediate_size=64, num_layers=2, num_heads=4,
        )
        base.update(kw)
        return SiglipVisionConfig(**base)


class SiglipBlock(nn.Module):
    cfg: SiglipVisionConfig

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cfg = self.cfg
        B, L, D = x.shape
        H = cfg.num_heads
        ln = lambda name: nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, name=name,
        )
        h = ln("ln1")(x)
        q = nn.Dense(D, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                     name="q_proj")(h).reshape(B, L, H, D // H)
        k = nn.Dense(D, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                     name="k_proj")(h).reshape(B, L, H, D // H)
        v = nn.Dense(D, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                     name="v_proj")(h).reshape(B, L, H, D // H)
        attn = multi_head_attention(q, k, v, causal=False, impl="dense")
        attn = nn.Dense(D, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                        name="out_proj")(attn.reshape(B, L, D))
        x = x + attn
        h = ln("ln2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype,
                     param_dtype=cfg.param_dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=True)  # gelu_pytorch_tanh
        h = nn.Dense(D, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                     name="fc2")(h)
        return x + h


class SiglipVisionTower(nn.Module):
    """(B, H, W, 3) -> (B, H/p * W/p, hidden); no prefix tokens."""

    cfg: SiglipVisionConfig

    @nn.compact
    def __call__(self, images: Array) -> Array:
        cfg = self.cfg
        B, Himg, Wimg, _ = images.shape
        gh, gw = Himg // cfg.patch_size, Wimg // cfg.patch_size

        x = nn.Conv(
            cfg.hidden_size,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            use_bias=True,
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            name="patch_embed",
        )(images.astype(cfg.dtype))
        x = x.reshape(B, gh * gw, cfg.hidden_size)

        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (cfg.grid ** 2, cfg.hidden_size), cfg.param_dtype,
        ).astype(cfg.dtype)
        if gh * gw != pos.shape[0]:
            # re-grid to the slice geometry (non-square handled by resize)
            src = int(pos.shape[0] ** 0.5)
            grid2d = pos.reshape(1, src, src, -1)
            grid2d = jax.image.resize(
                grid2d.astype(jnp.float32), (1, gh, gw, pos.shape[-1]),
                method="bicubic",
            ).astype(cfg.dtype)
            pos = grid2d.reshape(gh * gw, -1)
        x = x + pos[None]

        for i in range(cfg.num_layers):
            x = SiglipBlock(cfg, name=f"layer_{i}")(x)
        return nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, name="post_ln",
        )(x)
