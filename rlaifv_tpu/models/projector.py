"""Vision→LLM multimodal projector.

Flax rebuild of the reference projector factory
(ref: llava/model/multimodal_projector/builder.py:33-51 — 'linear',
'mlp2x_gelu' / 'mlpNx_gelu', 'identity').
"""
from __future__ import annotations

import re
from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class VisionProjector(nn.Module):
    projector_type: str
    out_features: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        def dense(i):
            return nn.Dense(
                self.out_features,
                use_bias=True,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                kernel_init=nn.initializers.normal(0.02),
                name=f"fc{i}",
            )

        if self.projector_type == "identity":
            return x
        if self.projector_type == "linear":
            return dense(0)(x)
        m = re.match(r"^mlp(\d+)x_gelu$", self.projector_type)
        if m:
            depth = int(m.group(1))
            x = dense(0)(x)
            for i in range(1, depth):
                x = dense(i)(nn.gelu(x, approximate=False))
            return x
        raise ValueError(f"Unknown projector type: {self.projector_type}")
