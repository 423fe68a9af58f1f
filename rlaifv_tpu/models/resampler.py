"""Perceiver resampler: grid² learnable queries cross-attend to ViT tokens.

Flax rebuild of the OmniLMM resampler (ref: omnilmm/model/resampler.py:
96-171 `Resampler`, :43-94 2D sincos position embedding, :23-39 bicubic
`get_abs_pos` interpolation for dynamic image sizes). Math matches torch
exactly, including nn.MultiheadAttention's packed in-proj semantics, so
converted weights reproduce features bit-for-bit (fp32).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def sincos_1d(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float32) / (embed_dim / 2.0)
    omega = 1.0 / 10000 ** omega
    out = np.einsum("m,d->md", pos.reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def sincos_2d_rect(embed_dim: int, grid_h: int, grid_w: int) -> np.ndarray:
    """(grid_h*grid_w, D): height-half ++ width-half (ref :43-72; the
    MiniCPM-V 2.5 resampler generates these per slice tgt_size)."""
    gh = np.arange(grid_h, dtype=np.float32)
    gw = np.arange(grid_w, dtype=np.float32)
    grid = np.meshgrid(gw, gh)  # w first
    grid = np.stack(grid, axis=0).reshape(2, 1, grid_h, grid_w)
    emb_h = sincos_1d(embed_dim // 2, grid[0])
    emb_w = sincos_1d(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1)


def sincos_2d(embed_dim: int, grid_size: int) -> np.ndarray:
    return sincos_2d_rect(embed_dim, grid_size, grid_size)


def interp_abs_pos(abs_pos: Array, tgt_len: int) -> Array:
    """Bicubic re-grid of a square position table (ref get_abs_pos :23-39)."""
    src = int(math.sqrt(abs_pos.shape[0]))
    tgt = int(math.sqrt(tgt_len))
    if src == tgt:
        return abs_pos
    grid = abs_pos.reshape(1, src, src, -1).astype(jnp.float32)
    out = jax.image.resize(
        grid, (1, tgt, tgt, grid.shape[-1]), method="bicubic"
    )
    return out.reshape(tgt * tgt, -1).astype(abs_pos.dtype)


@dataclasses.dataclass(frozen=True)
class ResamplerConfig:
    grid_size: int
    embed_dim: int
    num_heads: int
    kv_dim: Optional[int] = None
    ln_eps: float = 1e-6
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    # MiniCPM-V 2.5 semantics: query_num learned queries that need NOT be a
    # square grid (2.5 uses 96), and NO position embedding on the query
    # side — the adaptive resampler adds sincos positions to the keys only,
    # per slice tgt_size. OmniLMM (default) keeps grid² queries with
    # q + pos_embed (ref omnilmm/model/resampler.py:96-171).
    num_queries_override: Optional[int] = None
    query_pos: bool = True

    @property
    def num_queries(self) -> int:
        if self.num_queries_override is not None:
            return self.num_queries_override
        return self.grid_size ** 2


class Resampler(nn.Module):
    cfg: ResamplerConfig

    @nn.compact
    def __call__(self, x: Array, tgt_hw: Optional[tuple] = None) -> Array:
        """x: (B, N, kv_dim) ViT tokens -> (B, grid², embed_dim).

        tgt_hw: (grid_h, grid_w) of the token grid when non-square
        (MiniCPM-V slices); default assumes a square N grid."""
        cfg = self.cfg
        B, N, _ = x.shape
        D, H = cfg.embed_dim, cfg.num_heads

        pos_embed = None
        if cfg.query_pos:
            pos_embed = self.param(
                "pos_embed",
                lambda key: jnp.asarray(sincos_2d(D, cfg.grid_size),
                                        cfg.param_dtype),
            )
        query = self.param(
            "query", nn.initializers.truncated_normal(0.02),
            (cfg.num_queries, D), cfg.param_dtype,
        )

        if cfg.kv_dim is not None and cfg.kv_dim != D:
            x = nn.Dense(
                D, use_bias=False, dtype=cfg.dtype,
                param_dtype=cfg.param_dtype, name="kv_proj",
            )(x)

        ln = lambda name: nn.LayerNorm(
            epsilon=cfg.ln_eps, dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, name=name,
        )
        kv = ln("ln_kv")(x)  # (B, N, D)
        q = ln("ln_q")(query.astype(cfg.dtype))  # (Q, D)

        if tgt_hw is not None:
            kv_pos = jnp.asarray(
                sincos_2d_rect(D, tgt_hw[0], tgt_hw[1]), cfg.dtype
            )
        elif pos_embed is not None:
            kv_pos = interp_abs_pos(pos_embed.astype(cfg.dtype), N)  # (N, D)
        else:  # query_pos=False (2.5): fresh sincos table over the N grid
            side = int(math.sqrt(N))
            if side * side != N:
                raise ValueError(
                    f"non-square token count N={N} needs explicit tgt_hw"
                )
            kv_pos = jnp.asarray(sincos_2d_rect(D, side, side), cfg.dtype)

        # torch nn.MultiheadAttention packed projections
        def proj(name, inp):
            return nn.Dense(
                D, use_bias=True, dtype=cfg.dtype,
                param_dtype=cfg.param_dtype, name=name,
            )(inp)

        if cfg.query_pos:
            q_in = q[None] + pos_embed.astype(cfg.dtype)[None]  # (1, Q, D)
        else:  # 2.5: learned queries only, positions ride the keys
            q_in = q[None]
        k_in = kv + kv_pos[None]  # (B, N, D)

        qh = proj("attn_q", jnp.broadcast_to(q_in, (B,) + q_in.shape[1:]))
        kh = proj("attn_k", k_in)
        vh = proj("attn_v", kv)

        hd = D // H
        qh = qh.reshape(B, -1, H, hd)
        kh = kh.reshape(B, N, H, hd)
        vh = vh.reshape(B, N, H, hd)

        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32
        ) / math.sqrt(hd)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum(
            "bhqk,bkhd->bqhd", probs.astype(vh.dtype), vh,
            preferred_element_type=jnp.float32,
        ).reshape(B, -1, D).astype(cfg.dtype)

        out = nn.Dense(
            D, use_bias=True, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            name="attn_out",
        )(out)

        out = ln("ln_post")(out)
        final_proj = self.param(
            "proj",
            lambda key: (D ** -0.5) * jax.random.normal(key, (D, D),
                                                        cfg.param_dtype),
        )
        return out @ final_proj.astype(cfg.dtype)


def convert_resampler(sd, prefix: str = "", dtype=np.float32,
                      query_pos: bool = True) -> dict:
    """torch Resampler state dict -> flax params (in_proj split in q/k/v).

    query_pos must mirror ResamplerConfig.query_pos: with query_pos=False
    (MiniCPM-V 2.5) the flax module declares no 'pos_embed' param, so the
    converted tree must omit it to match model.init's structure."""

    def g(k):
        v = sd[prefix + k]
        if hasattr(v, "detach"):
            v = v.detach().float().cpu().numpy()
        return np.asarray(v).astype(dtype)

    D = g("query").shape[1]
    in_proj_w = g("attn.in_proj_weight")  # (3D, D)
    in_proj_b = g("attn.in_proj_bias")
    out = {
        "query": g("query"),
        "ln_q": {"scale": g("ln_q.weight"), "bias": g("ln_q.bias")},
        "ln_kv": {"scale": g("ln_kv.weight"), "bias": g("ln_kv.bias")},
        "ln_post": {"scale": g("ln_post.weight"), "bias": g("ln_post.bias")},
        "attn_q": {"kernel": in_proj_w[:D].T, "bias": in_proj_b[:D]},
        "attn_k": {"kernel": in_proj_w[D:2*D].T, "bias": in_proj_b[D:2*D]},
        "attn_v": {"kernel": in_proj_w[2*D:].T, "bias": in_proj_b[2*D:]},
        "attn_out": {
            "kernel": g("attn.out_proj.weight").T,
            "bias": g("attn.out_proj.bias"),
        },
        "proj": g("proj"),
    }
    if query_pos:
        out["pos_embed"] = g("pos_embed")
    if prefix + "kv_proj.weight" in sd:
        out["kv_proj"] = {"kernel": g("kv_proj.weight").T}
    return out
