"""Resampler parity vs an inline torch oracle (reference math restated)."""
import math

import numpy as np
import pytest
import torch
import torch.nn as tnn
import jax.numpy as jnp

from rlaifv_tpu.models.resampler import (
    Resampler,
    ResamplerConfig,
    convert_resampler,
    sincos_2d,
)


class TorchResampler(tnn.Module):
    """Oracle restating omnilmm/model/resampler.py:96-171."""

    def __init__(self, grid_size, embed_dim, num_heads, kv_dim):
        super().__init__()
        self.num_queries = grid_size ** 2
        self.pos_embed = tnn.Parameter(
            torch.from_numpy(sincos_2d(embed_dim, grid_size)).float(),
            requires_grad=False,
        )
        self.query = tnn.Parameter(torch.randn(self.num_queries, embed_dim))
        self.kv_proj = (
            tnn.Linear(kv_dim, embed_dim, bias=False)
            if kv_dim != embed_dim else tnn.Identity()
        )
        self.attn = tnn.MultiheadAttention(embed_dim, num_heads)
        self.ln_q = tnn.LayerNorm(embed_dim, eps=1e-6)
        self.ln_kv = tnn.LayerNorm(embed_dim, eps=1e-6)
        self.ln_post = tnn.LayerNorm(embed_dim, eps=1e-6)
        self.proj = tnn.Parameter(
            (embed_dim ** -0.5) * torch.randn(embed_dim, embed_dim)
        )

    def forward(self, x):
        pos_embed = self.pos_embed  # same-size path
        x = self.kv_proj(x)
        x = self.ln_kv(x).permute(1, 0, 2)
        N = x.shape[1]
        q = self.ln_q(self.query)
        q_rep = q.unsqueeze(1).repeat(1, N, 1)
        out = self.attn(
            q_rep + self.pos_embed.unsqueeze(1),
            x + pos_embed.unsqueeze(1),
            x,
        )[0]
        x = out.permute(1, 0, 2)
        x = self.ln_post(x)
        return x @ self.proj


def test_resampler_parity():
    torch.manual_seed(0)
    grid, D, H, KV = 3, 32, 4, 24
    oracle = TorchResampler(grid, D, H, KV).eval()

    sd = oracle.state_dict()
    params = convert_resampler(sd)

    cfg = ResamplerConfig(grid_size=grid, embed_dim=D, num_heads=H, kv_dim=KV)
    model = Resampler(cfg)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, grid * grid, KV)).astype(np.float32)

    with torch.no_grad():
        want = oracle(torch.tensor(x)).numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_resampler_dynamic_size_runs():
    grid, D, H, KV = 2, 16, 2, 16
    cfg = ResamplerConfig(grid_size=grid, embed_dim=D, num_heads=H, kv_dim=KV)
    model = Resampler(cfg)
    import jax

    x = jnp.ones((1, 16, KV))  # 4x4 tokens vs 2x2 pos grid -> interp path
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    out = model.apply({"params": params}, x)
    assert out.shape == (1, grid * grid, D)
    assert np.isfinite(np.asarray(out)).all()
