"""7B int8 serving on ONE v5e chip: autocheck reward scoring + decode.

BASELINE config 5 ("reward scoring at batch scale") at REAL 7B geometry:
bf16 7B cannot even load next to a KV cache on a 16G chip (13.5G weights);
the int8 base (6.75G + bf16 head) leaves room for a B=8, 1024-token cache,
so LLaVA-7B-geometry autocheck (prefill + 1-token yes/no logits) and
diverse-gen decode run single-chip.

Drives the engine's jitted run directly with device-resident inputs (a
whole `generate()` call re-uploads images through the ~20 MB/s tunnel —
0.3 s of noise per call). Decode rate = (t[max_new=65] - t[max_new=1])/64
with identical cache sizes, so prefill and fixed costs cancel.

Prints ONE JSON line. Weights are random-shaped; timing only.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    fused = os.environ.get("BENCH7B_FUSED", "") == "1"
    if fused:
        # must precede backend init (libtpu parses its args once)
        from rlaifv_tpu.ops.fused_decode import ensure_vmem_budget

        ensure_vmem_budget()
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from rlaifv_tpu.genai.engine import DecodeEngine
    from rlaifv_tpu.genai.sampling import SamplingParams
    from rlaifv_tpu.models.clip_vit import CLIPVisionConfig
    from rlaifv_tpu.models.llama import LlamaConfig
    from rlaifv_tpu.models.llava import LlavaConfig, LlavaForCausalLM

    on_tpu = jax.devices()[0].platform == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    tiny = os.environ.get("BENCH7B_TINY", "") == "1" or not on_tpu

    bits = int(os.environ.get("BENCH7B_BITS", "8"))  # 8 | 4 (packed int4)
    if tiny:
        cfg = LlavaConfig.tiny()
        llm_kw = dict(quantize=True, quantize_bits=bits,
                      quantize_lm_head=False)
        if fused:  # fused kernel needs fuse_proj + int8 KV + MHA, and
            # hardware-legal lanes (head_dim 128) when the smoke lands on
            # the real chip (the axon hook forces the TPU platform)
            llm_kw.update(fuse_proj=True, kv_cache_dtype="int8",
                          hidden_size=256, intermediate_size=512,
                          num_heads=2, num_kv_heads=2, head_dim=128)
        cfg = LlavaConfig(
            llm=LlamaConfig.tiny(**llm_kw),
            vision=cfg.vision,
        )
        B, Lp = 2, 64
    else:
        fuse = os.environ.get("BENCH7B_FUSE", "1") == "1"
        # default = the headline config (README): int8 KV cache lets B=24
        # fit (3x the bf16-cache batch; 1207.8 tok/s decode vs 981 at 16 —
        # weight-bound decode is near-flat in B, so batch is throughput);
        # BENCH7B_KVQ=0 BENCH7B_B=8 reproduces the bf16-cache run
        kvq = os.environ.get("BENCH7B_KVQ", "1") == "1"
        cfg = LlavaConfig(
            llm=LlamaConfig.vicuna_7b(
                quantize=True, quantize_bits=bits, quantize_lm_head=False,
                fuse_proj=fuse, kv_cache_dtype="int8" if kvq else "fp",
                dtype=dtype, param_dtype=dtype,
            ),
            vision=CLIPVisionConfig(
                image_size=336, patch_size=14, hidden_size=1024,
                intermediate_size=4096, num_layers=24, num_heads=16,
                dtype=dtype, param_dtype=dtype,
            ),
        )
        B = int(os.environ.get("BENCH7B_B", 24 if kvq else 8))
        Lp = 896  # 576 image tokens + ~320 of question/facts

    model = LlavaForCausalLM(cfg)
    P = cfg.num_image_tokens
    S = cfg.vision.image_size
    rng = np.random.default_rng(0)

    ids = rng.integers(5, cfg.llm.vocab_size - 1, size=(B, Lp)).astype(np.int32)
    ids[:, 0] = 1
    ids[:, 1 : 1 + P] = 0  # image span placeholder
    image_starts = np.full((B,), 1, np.int32)
    images = rng.normal(size=(B, S, S, 3)).astype(np.float32)

    init = jax.jit(model.init)
    params = init(
        jax.random.PRNGKey(0), jnp.asarray(ids[:2]),
        images=jnp.asarray(images[:2], dtype),
        image_starts=jnp.asarray(image_starts[:2]),
    )["params"]

    engine = DecodeEngine(model, params, fused_decode=fused)
    mask = np.ones((B, Lp), np.int32)
    ids_d = jnp.asarray(ids)
    mask_d = jnp.asarray(mask)
    imgs_d = jnp.asarray(images, dtype)
    starts_d = jnp.asarray(image_starts)
    key = jax.random.PRNGKey(0)

    sp = SamplingParams.greedy()
    max_len = -(-(Lp + 65) // 128) * 128  # same cache for both runs

    def timed(max_new, reps=3):
        run = engine._build(sp, max_new)

        def once():
            toks, fl = run(params, ids_d, mask_d, imgs_d, starts_d,
                           None, None, key, max_len=max_len)
            float(jnp.sum(fl[:, 0]))  # host fetch = real sync
            return None

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

    facts_per_sec = B / t1  # autocheck: prefill + 1-token yes/no logits
    decode_tok_s = B / decode_s
    wq = f"int{bits}"
    print(json.dumps({
        "metric": f"{wq}_7b_autocheck_facts_per_sec_per_chip",
        "value": round(facts_per_sec, 2),
        "unit": "facts/s",
        "vs_baseline": None,
        "detail": {
            "model": (f"llava15-7b-geometry {wq} (bf16 head)"
                      + (" fused-proj" if not tiny and fuse else "")
                      + (" kv-int8" if not tiny and kvq else "")
                      + (" fused-decode" if fused else ""))
            if not tiny else "tiny-smoke",
            "batch": B,
            "prompt_len": Lp,
            "prefill_ms_batch": round(t1 * 1e3, 1),
            "decode_tok_per_sec": round(decode_tok_s, 1),
            "decode_ms_per_step": round(decode_s * 1e3, 2),
            "note": "bf16 7B + KV cache does not fit 16G; int8 enables "
                    "single-chip 7B serving",
            "platform": jax.devices()[0].platform,
        },
    }))


if __name__ == "__main__":
    main()
