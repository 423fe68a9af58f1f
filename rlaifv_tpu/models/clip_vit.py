"""CLIP ViT vision tower in flax — LLaVA-1.5's image encoder.

TPU-native replacement for the HF `CLIPVisionModel` wrapper
(ref: llava/model/multimodal_encoder/clip_encoder.py:46-58 — forward taps
hidden layer -2 and drops the CLS token, `feature_select` :36). Math is
HF-compatible (quick-GELU, pre-layernorm ViT, learned position embeddings)
so converted CLIP-L/14-336 weights reproduce features exactly.

`select_layer=-2` is implemented the efficient way: the last transformer
block is simply never run (the reference computes it and throws it away).
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
class CLIPVisionConfig:
    image_size: int = 336
    patch_size: int = 14
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 24
    num_heads: int = 16
    layer_norm_eps: float = 1e-5
    select_layer: int = -2  # hidden-state tap (HF indexing over L+1 states)
    select_feature: str = "patch"  # "patch" drops CLS; "cls_patch" keeps it
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    # normalization constants for the on-device uint8 path: hosts ship
    # resized uint8 (half the bytes of bf16, a quarter of fp32 — transfer
    # is the dominant fixed cost of a generate call on slow links) and the
    # model normalizes in fp32 on chip, bit-equal to host preprocessing
    image_mean: Any = (0.48145466, 0.4578275, 0.40821073)  # OPENAI_CLIP
    image_std: Any = (0.26862954, 0.26130258, 0.27577711)

    @property
    def num_patches_per_side(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.num_patches_per_side ** 2

    @property
    def num_positions(self) -> int:
        return self.num_patches + 1

    @property
    def layers_to_run(self) -> int:
        # hidden_states[k] is the input of block k; tap -2 == output of
        # block L-2 input... HF: hidden_states has L+1 entries, [-2] is the
        # output of the (L-1)-th block, i.e. run L-1 blocks.
        idx = self.select_layer
        if idx < 0:
            idx = self.num_layers + 1 + idx
        return idx  # number of blocks whose output feeds the tap

    @staticmethod
    def clip_l_336(**kw) -> "CLIPVisionConfig":
        return CLIPVisionConfig(**kw)

    @staticmethod
    def tiny(**kw) -> "CLIPVisionConfig":
        base = dict(
            image_size=28,
            patch_size=7,
            hidden_size=32,
            intermediate_size=64,
            num_layers=3,
            num_heads=4,
        )
        base.update(kw)
        return CLIPVisionConfig(**base)


def quick_gelu(x: Array) -> Array:
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cfg = self.cfg
        B, L, C = x.shape
        H = cfg.num_heads
        D = C // H

        def dense(name, names=("embed", "qkv")):
            return nn.Dense(
                C,
                use_bias=True,
                dtype=cfg.dtype,
                param_dtype=cfg.param_dtype,
                kernel_init=nn.initializers.normal(0.01),
                name=name,
            )

        q = dense("q_proj")(x).reshape(B, L, H, D)
        k = dense("k_proj")(x).reshape(B, L, H, D)
        v = dense("v_proj")(x).reshape(B, L, H, D)
        out = multi_head_attention(q, k, v, causal=False, impl="dense")
        out = out.reshape(B, L, C)
        return dense("out_proj", ("qkv", "embed"))(out)


class CLIPBlock(nn.Module):
    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cfg = self.cfg
        ln = lambda name: nn.LayerNorm(
            epsilon=cfg.layer_norm_eps,
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            name=name,
        )
        x = x + CLIPAttention(cfg, name="attn")(ln("ln1")(x))
        h = ln("ln2")(x)
        h = nn.Dense(
            cfg.intermediate_size,
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            kernel_init=nn.initializers.normal(0.01),
            name="fc1",
        )(h)
        h = quick_gelu(h)
        h = nn.Dense(
            cfg.hidden_size,
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            kernel_init=nn.initializers.normal(0.01),
            name="fc2",
        )(h)
        return x + h


class CLIPVisionTower(nn.Module):
    """Images (B, H, W, 3) normalized -> patch features (B, P, hidden)."""

    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, images: Array) -> Array:
        cfg = self.cfg
        B = images.shape[0]

        patches = nn.Conv(
            cfg.hidden_size,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            use_bias=False,
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            kernel_init=nn.initializers.normal(0.02),
            name="patch_embed",
        )(images.astype(cfg.dtype))
        patches = patches.reshape(B, -1, cfg.hidden_size)

        cls_tok = self.param(
            "cls_token",
            nn.initializers.normal(0.02),
            (cfg.hidden_size,),
            cfg.param_dtype,
        )
        cls_tok = jnp.broadcast_to(
            cls_tok.astype(cfg.dtype)[None, None, :], (B, 1, cfg.hidden_size)
        )
        x = jnp.concatenate([cls_tok, patches], axis=1)

        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (cfg.num_positions, cfg.hidden_size),
            cfg.param_dtype,
        )
        x = x + pos.astype(cfg.dtype)[None]

        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps,
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            name="pre_ln",
        )(x)

        for i in range(cfg.layers_to_run):
            x = CLIPBlock(cfg, name=f"layer_{i}")(x)

        if cfg.select_feature == "patch":
            return x[:, 1:]
        if cfg.select_feature == "cls_patch":
            return x
        raise ValueError(f"Unexpected select feature: {cfg.select_feature}")
