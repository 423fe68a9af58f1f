"""Multi-layer fused decode kernel at 7B geometry on one chip.

Times K fused decode steps (x fed back through the layer stack, cache
scattered each step — a real greedy-decode dependency chain) with the
scan-differencing method from bench.py, against the round-1 serve bench's
per-layer decode (981 tok/s = 16.3 ms/step at the same B=16 int8-KV
config). Weights are zeros int8 + unit scales: timing is value
independent.

Prints ONE JSON line. BENCHFD_TINY=1 smoke-runs the same code on CPU.
"""
from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    # the multi-layer kernel double-buffers ~45MB of weight/cache blocks;
    # the default 16MB scoped-vmem budget is an XLA flag, not the v5e
    # hardware limit — raise it (see ops/fused_decode.py docstring)
    os.environ["LIBTPU_INIT_ARGS"] = (
        os.environ.get("LIBTPU_INIT_ARGS", "")
        + " --xla_tpu_scoped_vmem_limit_kib=101376"
    ).strip()
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from rlaifv_tpu.models.llama import LlamaConfig
    from rlaifv_tpu.ops.fused_decode import (
        default_dims,
        fused_decode_step,
        scatter_new_kv,
    )

    on_tpu = jax.devices()[0].platform == "tpu"
    tiny = os.environ.get("BENCHFD_TINY", "") == "1" or not on_tpu
    bits = int(os.environ.get("BENCHFD_BITS", "8"))  # 8 | 4 (packed int4)
    if tiny:
        # hardware-legal tiny geometry: lane dims must be 128 multiples
        cfg = LlamaConfig.tiny(quantize=True, quantize_bits=bits,
                               quantize_lm_head=False,
                               fuse_proj=True, kv_cache_dtype="int8",
                               hidden_size=256, intermediate_size=512,
                               num_heads=2, num_kv_heads=2, head_dim=128)
        B, L, t0 = 8, 128, 17
    else:
        cfg = LlamaConfig.vicuna_7b(
            quantize=True, quantize_bits=bits, quantize_lm_head=False,
            fuse_proj=True, kv_cache_dtype="int8", dtype=jnp.bfloat16,
            param_dtype=jnp.bfloat16,
        )
        B = int(os.environ.get("BENCHFD_B", 16))
        L = int(os.environ.get("BENCHFD_L", 1024))
        t0 = int(os.environ.get("BENCHFD_T0", 640))

    d = default_dims(cfg, L)
    n, D, KVH, Dh, I = d.n_layers, d.D, d.KVH, d.Dh, d.Ip
    Nq = d.Nq

    if d.w4:
        stacked = {  # nibble-packed int8 weights (two per byte in HBM)
            "wqkv": jnp.zeros((n, D // 2, Nq), jnp.int8),
            "sqkv": jnp.ones((n, D // d.g_d, Nq), jnp.float32) * 0.01,
            "wo": jnp.zeros((n, d.H * Dh // 2, D), jnp.int8),
            "so": jnp.ones((n, d.H * Dh // d.g_o, D), jnp.float32) * 0.01,
            "wgu": jnp.zeros((n, D // 2, 2 * I), jnp.int8),
            "sgu": jnp.ones((n, D // d.g_d, 2 * I), jnp.float32) * 0.01,
            "wdown": jnp.zeros((n, I // 2, D), jnp.int8),
            # banded per-bi-block scale rows (FusedDecodeDims.sdb)
            "sdown": jnp.ones((n, d.nI * d.sdb, D), jnp.float32) * 0.01,
            "ln": jnp.ones((n, 2, D), jnp.float32),
        }
    else:
        stacked = {
            "wqkv": jnp.zeros((n, D, Nq), jnp.int8),
            "sqkv": jnp.ones((n, 1, Nq), jnp.float32) * 0.01,
            "wo": jnp.zeros((n, d.H * Dh, D), jnp.int8),
            "so": jnp.ones((n, 1, D), jnp.float32) * 0.01,
            "wgu": jnp.zeros((n, D, 2 * I), jnp.int8),
            "sgu": jnp.ones((n, 1, 2 * I), jnp.float32) * 0.01,
            "wdown": jnp.zeros((n, I, D), jnp.int8),
            "sdown": jnp.ones((n, 1, D), jnp.float32) * 0.01,
            "ln": jnp.ones((n, 2, D), jnp.float32),
        }
    cache = {  # h-major stacked layout (see ops/fused_decode.py)
        "k": jnp.zeros((n, KVH, B, L, Dh), jnp.int8),
        "k_scale": jnp.ones((n, KVH, B, L), jnp.float32) * 0.01,
        "v": jnp.zeros((n, KVH, B, L, Dh), jnp.int8),
        "v_scale": jnp.ones((n, KVH, B, L), jnp.float32) * 0.01,
    }
    mask = jnp.zeros((B, L), jnp.int32).at[:, :t0].set(1)
    x0 = jnp.ones((B, D), jnp.float32) * 0.01

    # weights/mask as arguments (not closed-over constants: captured
    # consts are re-materialized into the executable — 6.5GB of them)
    @partial(jax.jit, static_argnames=("k",), donate_argnums=(1,))
    def run(x, cache, stacked, mask, k):
        def body(i, carry):
            x, cache = carry
            ci = t0 + i
            pos = jnp.full((B,), ci, jnp.int32)
            x_out, new_kv = fused_decode_step(
                stacked, cache, x, mask, pos, ci, d,
                rope_theta=cfg.rope_theta, interpret=not on_tpu,
            )
            cache = scatter_new_kv(cache, new_kv, ci)
            # loop-carried dependency: feed the hidden state back
            return x_out * 0.01, cache

        x, cache = jax.lax.fori_loop(0, k, body, (x, cache))
        return x.sum(), cache

    # donated cache threads through: each timed call consumes the previous
    # call's output buffer (timing is value-independent — zero weights)
    state = {"c": jax.device_put(cache)}

    def timed(k):
        jax.block_until_ready(state["c"])
        t = time.perf_counter()
        s, c2 = run(x0, state["c"], stacked, mask, k)
        float(s)
        state["c"] = c2
        return time.perf_counter() - t

    k_small, k_big = (1, 2) if tiny else (4, 36)
    timed(k_small)
    timed(k_big)
    ts = min(timed(k_small) for _ in range(3))
    tb = min(timed(k_big) for _ in range(3))
    dt = (tb - ts) / (k_big - k_small)

    tok_s = B / dt
    weights_bytes = (n * (D * Nq + d.H * Dh * D + D * 2 * I + I * D))
    if d.w4:
        weights_bytes //= 2  # two nibbles per byte
    kv_bytes_step = 2 * n * B * KVH * t0 * Dh  # int8 live prefix reads
    floor_ms = (weights_bytes + kv_bytes_step) / 819e9 * 1e3  # v5e ~819GB/s

    print(json.dumps({
        "metric": f"fused_decode_int{bits}_tok_per_sec",
        "value": round(tok_s, 1),
        "unit": "tok/s",
        "vs_baseline": None,
        "detail": {
            "geometry": "7b" if not tiny else "tiny",
            "batch": B, "cache_len": L, "prefix": t0,
            "step_ms": round(dt * 1e3, 2),
            "hbm_floor_ms": round(floor_ms, 2),
            "vs_floor": round(dt * 1e3 / floor_ms, 3),
            "phases_per_layer": d.phases,
            "blocks": {"bn_qkv": d.bn_qkv, "bl": d.bl, "bn_o": d.bn_o,
                       "bi": d.bi},
            "round1_per_layer_decode_ms": 16.3 if not tiny else None,
        },
    }))


if __name__ == "__main__":
    main()
