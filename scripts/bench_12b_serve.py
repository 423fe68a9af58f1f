"""OmniLMM-12B int8 labeler serving on ONE 16G v5e chip.

The reference runs the 12B autocheck labeler (1-token yes/no per fact) on
A100-80G GPUs, 8-way fanned out (script/data_gen/omnilmm/
omnilmm_autocheck.sh:26-38; engine omnilmm/omnilmm_gen_data.py:182-369).
bf16 12B cannot even load on a 16G chip (EVA02-enormous 8.8G + Mistral-7B
14G). Weight-only int8 on BOTH towers (models/convert.py::
quantize_vision_int8 + quantize_llm_int8, OmniLMMConfig.omnilmm_12b_int8)
fits the whole model + int8 KV cache in ~12G, so the full labeler serves
single-chip:

  autocheck  = EVA02-e encode (448px -> 1025 patch tokens, the dominant
               cost: ~8.8 TFLOP/image) + 64-query resample + prefill +
               1-token yes/no logits, per fact
  decode     = tok/s at the same batch (12B chat-style generation)

Synthetic weights at the real 12B geometry (init-zero int8 kernels run
the same ops); images are device-resident so the ~20 MB/s tunnel upload
does not pollute kernel timing. Prints ONE JSON line.
BENCH12B_TINY=1 smoke-runs the same code path at tiny geometry.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import dataclasses

    fused = os.environ.get("BENCH12B_FUSED", "") == "1"
    if fused:
        # must precede backend init (libtpu parses its args once)
        from rlaifv_tpu.ops.fused_decode import ensure_vmem_budget

        ensure_vmem_budget()
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rlaifv_tpu.genai.engine import DecodeEngine
    from rlaifv_tpu.genai.sampling import SamplingParams
    from rlaifv_tpu.models.omnilmm import OmniLMMConfig, OmniLMMForCausalLM

    on_tpu = jax.devices()[0].platform == "tpu"
    tiny = os.environ.get("BENCH12B_TINY", "") == "1" or not on_tpu
    bits = int(os.environ.get("BENCH12B_BITS", "8"))  # 8 | 4 (packed int4)
    if tiny:
        base = OmniLMMConfig.tiny()
        cfg = OmniLMMConfig(
            llm=dataclasses.replace(base.llm, quantize=True,
                                    quantize_bits=bits,
                                    quantize_lm_head=False,
                                    kv_cache_dtype="int8",
                                    fuse_proj=fused),
            vision=dataclasses.replace(base.vision, quantize=True,
                                       quantize_bits=bits),
            num_query=base.num_query,
        )
        B, Lq, S = 2, 32, base.vision.image_size
    else:
        cfg = OmniLMMConfig.omnilmm_12b_int8(bits=bits)
        if fused:
            cfg = dataclasses.replace(
                cfg, llm=dataclasses.replace(cfg.llm, fuse_proj=True)
            )
        B = int(os.environ.get("BENCH12B_B", 8))
        Lq = 128  # question + "Please answer yes or no." budget
        S = 448  # OmniLMM-12B input resolution (dynamic pos-embed interp)

    model = OmniLMMForCausalLM(cfg)
    T = cfg.num_image_tokens
    Lp = -(-(T + Lq) // 64) * 64
    rng = np.random.default_rng(0)

    ids = rng.integers(5, cfg.llm.vocab_size - 1, size=(B, Lp)).astype(np.int32)
    ids[:, 0] = 1
    ids[:, 1 : 1 + T] = 0  # resampled image-query span
    image_starts = np.full((B,), 1, np.int32)
    images = rng.normal(size=(B, S, S, 3)).astype(np.float32)

    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(ids[:2]),
        images=jnp.asarray(images[:2], cfg.llm.dtype),
        image_starts=jnp.asarray(image_starts[:2]),
    )["params"]

    engine = DecodeEngine(model, params, eos_id=-1, pad_id=0,
                          fused_decode=fused)
    ids_d = jnp.asarray(ids)
    mask_d = jnp.asarray(np.ones((B, Lp), np.int32))
    imgs_d = jnp.asarray(images, cfg.llm.dtype)
    starts_d = jnp.asarray(image_starts)
    key = jax.random.PRNGKey(0)

    sp = SamplingParams.greedy()
    max_len = -(-(Lp + 65) // 128) * 128  # same cache both runs

    def timed(max_new, reps=3):
        run = engine._build(sp, max_new)

        def once():
            toks, fl = run(engine.params, ids_d, mask_d, imgs_d, starts_d,
                           None, None, key, max_len=max_len)
            float(jnp.sum(fl[:, 0]))  # host fetch = real sync

        t0 = time.perf_counter(); once(); compile_s = time.perf_counter() - t0
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            once()
            times.append(time.perf_counter() - t0)
        return min(times), compile_s

    t1, _ = timed(1)
    t65, _ = timed(65)
    decode_s = max(t65 - t1, 1e-9) / 64

    facts_per_sec = B / t1  # encode + resample + prefill + yes/no logits
    print(json.dumps({
        "metric": f"int{bits}_12b_autocheck_facts_per_sec_per_chip",
        "value": round(facts_per_sec, 2),
        "unit": "facts/s",
        "vs_baseline": None,
        "detail": {
            "model": (f"omnilmm-12b-geometry int{bits} LM + int{bits} "
                      "EVA02-e tower + int8 KV"
                      + (" fused-decode" if fused else ""))
            if not tiny else "tiny-smoke",
            "batch": B,
            "image_px": S,
            "prompt_len": Lp,
            "encode_prefill_ms_batch": round(t1 * 1e3, 1),
            "decode_tok_per_sec": round(B / decode_s, 1),
            "decode_ms_per_step": round(decode_s * 1e3, 2),
            "note": "bf16 12B cannot load on 16G; the reference labels "
                    "with this model on A100-80G",
            "platform": jax.devices()[0].platform,
        },
    }))


if __name__ == "__main__":
    main()
