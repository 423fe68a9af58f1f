"""Shared-prefix autocheck A/B at 7B geometry on ONE chip.

The autocheck workload (ref muffin/llava15_gen_data.py:266-313 +
script/data_gen/*autocheck.sh) scores dozens of fact questions per image —
10 answers/question x ~5 facts/answer — and every one of those prompts
shares the system prompt + 576 image tokens; only the short fact question
differs AFTER the image. The reference (and our plain path) runs one FULL
prefill per fact. The shared path (engine.score_shared_prefix) prefills the
prefix ONCE per image, broadcasts its KV, and prefills only the ~2-line
suffixes — same logits (tests/test_genai_pipeline.py parity), a fraction of
the FLOPs.

A/B here: G facts about one image, prefix P=832 (576 image + 256 system/
question context), suffix 40 tokens -> total 872 ~ the serve bench's
Lp=896 geometry. Plain = the 13.25 facts/s headline path (B=24, int8 KV).

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

    if tiny:
        base = LlavaConfig.tiny()
        cfg = LlavaConfig(
            llm=LlamaConfig.tiny(quantize=True, quantize_lm_head=False),
            vision=base.vision,
        )
        G, P_extra, sfx_len = 6, 8, 6
        B_plain, B_shared = 2, 2
    else:
        cfg = LlavaConfig(
            llm=LlamaConfig.vicuna_7b(
                quantize=True, quantize_lm_head=False, fuse_proj=True,
                kv_cache_dtype="int8", dtype=dtype, param_dtype=dtype,
            ),
            vision=CLIPVisionConfig(
                image_size=336, patch_size=14, hidden_size=1024,
                intermediate_size=4096, num_layers=24, num_heads=16,
                dtype=dtype, param_dtype=dtype,
            ),
        )
        G = int(os.environ.get("BENCH_G", "48"))  # facts per image
        P_extra, sfx_len = 256, 40  # prefix context + fact-question length
        B_plain = int(os.environ.get("BENCH_B_PLAIN", "24"))
        B_shared = int(os.environ.get("BENCH_B_SHARED", "8"))

    model = LlavaForCausalLM(cfg)
    NP = cfg.num_image_tokens
    S = cfg.vision.image_size
    rng = np.random.default_rng(0)
    V = cfg.llm.vocab_size

    P = 1 + NP + P_extra  # bos + image span + system/question context
    prefix = rng.integers(5, V - 1, size=(P,)).astype(np.int32)
    prefix[0] = 1
    prefix[1 : 1 + NP] = 0
    suffixes = [rng.integers(5, V - 1, size=(sfx_len,)).astype(np.int32).tolist()
                for _ in range(G)]
    image = rng.normal(size=(S, S, 3)).astype(np.float32)

    full = [prefix.tolist() + s for s in suffixes]
    Lp = -(-len(full[0]) // 64) * 64
    ids = np.zeros((B_plain, Lp), np.int32)
    mask = np.zeros((B_plain, Lp), np.int32)
    off = Lp - len(full[0])
    for r in range(B_plain):
        row = full[r % G]
        ids[r, off:] = row
        mask[r, off:] = 1
    image_starts = np.full((B_plain,), off + 1, np.int32)
    images = np.broadcast_to(image, (B_plain, S, S, 3)).copy()

    init = jax.jit(model.init)
    params = init(
        jax.random.PRNGKey(0), jnp.asarray(ids[:2]),
        images=jnp.asarray(images[:2], dtype),
        image_starts=jnp.asarray(image_starts[:2]),
    )["params"]
    engine = DecodeEngine(model, params)

    # ---- plain: one full prefill per fact (the reference pattern)
    sp = SamplingParams.greedy()
    max_len = -(-(Lp + 1) // 128) * 128
    run = engine._build(sp, 1)
    ids_d, mask_d = jnp.asarray(ids), jnp.asarray(mask)
    imgs_d = jnp.asarray(images, dtype)
    starts_d = jnp.asarray(image_starts)
    key = jax.random.PRNGKey(0)

    def plain_once():
        n_batches = -(-G // B_plain)
        for _ in range(n_batches):
            _, fl = run(params, ids_d, mask_d, imgs_d, starts_d,
                        None, None, key, max_len=max_len)
        float(jnp.sum(fl[:, 0]))

    plain_once()  # compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        plain_once()
        times.append(time.perf_counter() - t0)
    t_plain = min(times)

    # ---- shared: one prefix prefill per image + suffix-only batches
    def shared_once():
        return engine.score_shared_prefix(
            prefix.tolist(), suffixes, image=image,
            image_start=1, batch_size=B_shared,
        )

    logits_shared = shared_once()  # compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        shared_once()
        times.append(time.perf_counter() - t0)
    t_shared = min(times)

    speedup = t_plain / t_shared
    print(json.dumps({
        "metric": "int8_7b_autocheck_shared_prefix_facts_per_sec",
        "value": round(G / t_shared, 2),
        "unit": "facts/s",
        "vs_baseline": None,
        "detail": {
            "model": "tiny-smoke" if tiny
            else "llava15-7b-geometry int8 fused-proj",
            "facts_per_image": G,
            "prefix_len": P,
            "suffix_len": sfx_len,
            "plain_facts_per_sec": round(G / t_plain, 2),
            "shared_facts_per_sec": round(G / t_shared, 2),
            "speedup": round(speedup, 2),
            "batch_plain": B_plain,
            "batch_shared": B_shared,
            "logits_shape": list(np.asarray(logits_shared).shape),
            "platform": jax.devices()[0].platform,
        },
    }))


if __name__ == "__main__":
    main()
