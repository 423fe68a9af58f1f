"""MiniCPM-Llama3-V 2.5 int8 labeler serving on ONE 16G v5e chip.

The reference drives this model's autocheck one item at a time on a full
GPU per process (minicpm-llama3-v-25/minicpmv_autocheck.py:85-195, chunked
across GPUs). Llama3-8B bf16 alone is 16G — it cannot load on a 16G chip;
weight-only int8 (MiniCPMVConfig.minicpm_llama3_v25_int8) fits LM + bf16
SigLIP-400M tower + int8 KV in ~10G.

autocheck/fact = SigLIP encode of the slice batch (source + S-1 grid
slices at scale_resolution, the 2.5 slicing geometry) + 96-query resample
per slice + prefill with multi-span splice + 1-token yes/no logits.
Synthetic weights at real geometry; device-resident slices (the ~20 MB/s
tunnel upload is not a kernel cost). Prints ONE JSON line.
BENCHMCV_TINY=1 smoke-runs the same path at tiny geometry.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    fused = os.environ.get("BENCHMCV_FUSED", "") == "1"
    if fused:
        from rlaifv_tpu.ops.fused_decode import ensure_vmem_budget

        ensure_vmem_budget()
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rlaifv_tpu.genai.engine import DecodeEngine
    from rlaifv_tpu.genai.sampling import SamplingParams
    from rlaifv_tpu.models.minicpmv import MiniCPMVConfig, MiniCPMVForCausalLM

    on_tpu = jax.devices()[0].platform == "tpu"
    tiny = os.environ.get("BENCHMCV_TINY", "") == "1" or not on_tpu
    bits = int(os.environ.get("BENCHMCV_BITS", "8"))  # 8 | 4 (packed int4)
    import dataclasses

    if tiny:
        base = MiniCPMVConfig.tiny()
        cfg = dataclasses.replace(
            base,
            llm=dataclasses.replace(base.llm, quantize=True,
                                    quantize_bits=bits,
                                    quantize_lm_head=False,
                                    kv_cache_dtype="int8",
                                    fuse_proj=fused),
        )
        B, S, Lq = 2, 2, 16
    else:
        cfg = MiniCPMVConfig.minicpm_llama3_v25_int8(bits=bits)
        if fused:
            cfg = dataclasses.replace(
                cfg, llm=dataclasses.replace(cfg.llm, fuse_proj=True)
            )
        B = int(os.environ.get("BENCHMCV_B", 8))
        S = int(os.environ.get("BENCHMCV_SLICES", 5))  # source + 2x2 grid
        Lq = 96

    model = MiniCPMVForCausalLM(cfg)
    Q = cfg.query_num
    px = cfg.scale_resolution
    Lp = -(-(S * Q + Lq) // 64) * 64
    rng = np.random.default_rng(0)

    slices = rng.normal(size=(B * S, px, px, 3)).astype(np.float32)
    ids = rng.integers(5, cfg.llm.vocab_size - 1, size=(B, Lp)).astype(np.int32)
    ids[:, 0] = 1
    span_starts = np.stack(
        [1 + np.arange(S, dtype=np.int32) * Q] * B
    )  # (B, S)
    for b in range(B):
        for s in range(S):
            ids[b, 1 + s * Q : 1 + (s + 1) * Q] = 0

    lm_params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(ids[:2]),
        span_features=jnp.zeros((2, S, Q, cfg.llm.hidden_size),
                                cfg.llm.dtype),
        span_starts=jnp.asarray(span_starts[:2]),
    )["params"]
    vision_params = jax.jit(
        lambda r, v: model.init(r, v, method=model.encode_slices)
    )(jax.random.PRNGKey(1), jnp.asarray(slices[:2], cfg.llm.dtype))["params"]
    params = {**lm_params, **vision_params}

    encode = jax.jit(
        lambda p, v: model.apply({"params": p}, v,
                                 method=model.encode_slices)
    )
    slices_d = jnp.asarray(slices, cfg.llm.dtype)

    def encode_once():
        feats = encode(params, slices_d)
        float(jnp.sum(feats[0, 0].astype(jnp.float32)))  # real sync
        return feats

    feats = encode_once()  # compile
    t0 = time.perf_counter()
    feats = encode_once()
    t_enc = time.perf_counter() - t0
    spans = feats.reshape(B, S, Q, -1)

    engine = DecodeEngine(model, params, eos_id=-1, pad_id=0,
                          fused_decode=fused)
    ids_d = jnp.asarray(ids)
    mask_d = jnp.asarray(np.ones((B, Lp), np.int32))
    sstarts_d = jnp.asarray(span_starts)
    key = jax.random.PRNGKey(0)
    sp = SamplingParams.greedy()
    max_len = -(-(Lp + 65) // 128) * 128

    def timed(max_new, reps=3):
        run = engine._build(sp, max_new)

        def once():
            toks, fl = run(engine.params, ids_d, mask_d, None, None,
                           spans, sstarts_d, key, max_len=max_len)
            float(jnp.sum(fl[:, 0]))

        once()  # compile
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            once()
            times.append(time.perf_counter() - t0)
        return min(times)

    t1 = timed(1)
    t65 = timed(65)
    decode_s = max(t65 - t1, 1e-9) / 64

    facts_per_sec = B / (t_enc + t1)
    print(json.dumps({
        "metric": f"int{bits}_minicpmv25_autocheck_facts_per_sec_per_chip",
        "value": round(facts_per_sec, 2),
        "unit": "facts/s",
        "vs_baseline": None,
        "detail": {
            "model": ("minicpm-llama3-v25-geometry int8 LM + bf16 "
                      "siglip-400m + int8 KV") if not tiny else "tiny-smoke",
            "batch": B,
            "slices_per_item": S,
            "slice_px": px,
            "prompt_len": Lp,
            "encode_ms_batch": round(t_enc * 1e3, 1),
            "prefill_ms_batch": round(t1 * 1e3, 1),
            "decode_tok_per_sec": round(B / decode_s, 1),
            "decode_ms_per_step": round(decode_s * 1e3, 2),
            "note": "llama3-8b bf16 alone is 16G — cannot load on this "
                    "chip; the reference runs one item per A100 process",
            "platform": jax.devices()[0].platform,
        },
    }))


if __name__ == "__main__":
    main()
