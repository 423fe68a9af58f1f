"""Shared-prefix autocheck A/B on ONE chip, all three labeler families.

The autocheck workload (ref muffin/llava15_gen_data.py:266-313 +
script/data_gen/*autocheck.sh) scores dozens of fact questions per image —
10 answers/question x ~5 facts/answer — and every one of those prompts
shares the vision encode + system prompt + image-token prefix; only the
short fact question differs AFTER the image. The reference (and our plain
path) runs one FULL encode+prefill per fact. The shared path
(engine.score_shared_prefix) encodes + prefills the prefix ONCE per image,
broadcasts its KV, and prefills only the ~2-line suffixes — same logits
(parity tests in tests/test_genai_pipeline.py, test_omni_gen.py,
test_minicpmv_gen.py), a fraction of the FLOPs.

BENCH_MODEL=llava (default) | omni | minicpmv; BENCH_G facts per image.
Prints ONE JSON line. Weights are random-shaped; timing only.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _timeit(fn, reps=3):
    fn()  # compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from rlaifv_tpu.genai.engine import DecodeEngine
    from rlaifv_tpu.genai.sampling import SamplingParams

    which = os.environ.get("BENCH_MODEL", "llava")
    on_tpu = jax.devices()[0].platform == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    tiny = os.environ.get("BENCH7B_TINY", "") == "1" or not on_tpu
    rng = np.random.default_rng(0)
    G = int(os.environ.get("BENCH_G", "6" if tiny else "48"))
    sfx_len = 6 if tiny else 40
    sp = SamplingParams.greedy()
    key = jax.random.PRNGKey(0)

    span_feats = span_starts_1 = None  # minicpmv path
    if which == "llava":
        from rlaifv_tpu.models.clip_vit import CLIPVisionConfig
        from rlaifv_tpu.models.llama import LlamaConfig
        from rlaifv_tpu.models.llava import LlavaConfig, LlavaForCausalLM

        if tiny:
            base = LlavaConfig.tiny()
            cfg = LlavaConfig(
                llm=LlamaConfig.tiny(quantize=True, quantize_lm_head=False),
                vision=base.vision,
            )
            P_extra, B_plain, B_shared = 8, 2, 2
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
            P_extra = 256  # system/question context ahead of the facts
            B_plain = int(os.environ.get("BENCH_B_PLAIN", "24"))
            B_shared = int(os.environ.get("BENCH_B_SHARED", "8"))
        model = LlavaForCausalLM(cfg)
        desc = ("tiny-smoke" if tiny
                else "llava15-7b-geometry int8 fused-proj")
    elif which == "omni":
        import dataclasses

        from rlaifv_tpu.models.omnilmm import (
            OmniLMMConfig,
            OmniLMMForCausalLM,
        )

        if tiny:
            base = OmniLMMConfig.tiny()
            cfg = OmniLMMConfig(
                llm=dataclasses.replace(base.llm, quantize=True,
                                        quantize_lm_head=False),
                vision=base.vision, num_query=base.num_query,
            )
            P_extra, B_plain, B_shared = 8, 2, 2
        else:
            cfg = OmniLMMConfig.omnilmm_12b_int8()
            P_extra = 32
            B_plain = int(os.environ.get("BENCH_B_PLAIN", "8"))
            B_shared = int(os.environ.get("BENCH_B_SHARED", "16"))
        model = OmniLMMForCausalLM(cfg)
        desc = ("tiny-smoke" if tiny
                else "omnilmm-12b-geometry int8 LM + int8 EVA02-e tower")
    elif which == "minicpmv":
        import dataclasses

        from rlaifv_tpu.models.minicpmv import (
            MiniCPMVConfig,
            MiniCPMVForCausalLM,
        )

        if tiny:
            base = MiniCPMVConfig.tiny()
            cfg = dataclasses.replace(
                base,
                llm=dataclasses.replace(base.llm, quantize=True,
                                        quantize_lm_head=False),
            )
            NS, B_plain, B_shared = 2, 2, 2
        else:
            cfg = MiniCPMVConfig.minicpm_llama3_v25_int8()
            NS = 5  # source + 2x2 grid slices
            B_plain = int(os.environ.get("BENCH_B_PLAIN", "8"))
            B_shared = int(os.environ.get("BENCH_B_SHARED", "8"))
        model = MiniCPMVForCausalLM(cfg)
        desc = ("tiny-smoke" if tiny
                else "minicpm-llama3-v25-geometry int8 Llama3 + SigLIP")
    else:
        raise SystemExit(f"unknown BENCH_MODEL={which}")

    V = cfg.llm.vocab_size
    suffixes = [
        rng.integers(5, V - 1, size=(sfx_len,)).astype(np.int32).tolist()
        for _ in range(G)
    ]

    if which == "minicpmv":
        # prefix = bos + NS spans of query_num placeholders; slices encode
        # per fact on the plain path, once on the shared path
        Q = cfg.query_num
        px = cfg.scale_resolution
        P = 1 + NS * Q
        prefix = rng.integers(5, V - 1, size=(P,)).astype(np.int32)
        prefix[0] = 1
        span_starts_1 = 1 + np.arange(NS, dtype=np.int32) * Q
        for s in range(NS):
            prefix[1 + s * Q : 1 + (s + 1) * Q] = 0
        slices = rng.normal(size=(NS, px, px, 3)).astype(np.float32)
        image = None
        image_start = -1
    else:
        NP = cfg.num_image_tokens
        S = cfg.vision.image_size
        P = 1 + NP + P_extra
        prefix = rng.integers(5, V - 1, size=(P,)).astype(np.int32)
        prefix[0] = 1
        prefix[1 : 1 + NP] = 0
        image = rng.normal(size=(S, S, 3)).astype(np.float32)
        image_start = 1

    # ---- build full-prompt plain batch (one full prefill per fact)
    full = [prefix.tolist() + s for s in suffixes]
    Lp = -(-len(full[0]) // 64) * 64
    ids = np.zeros((B_plain, Lp), np.int32)
    mask = np.zeros((B_plain, Lp), np.int32)
    off = Lp - len(full[0])
    for r in range(B_plain):
        ids[r, off:] = full[r % G]
        mask[r, off:] = 1

    if which == "minicpmv":
        lm_params = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.asarray(ids[:2]),
            span_features=jnp.zeros(
                (2, NS, cfg.query_num, cfg.llm.hidden_size), cfg.llm.dtype
            ),
            span_starts=jnp.asarray(
                np.stack([off + span_starts_1] * 2)
            ),
        )["params"]
        vision_params = jax.jit(
            lambda r, v: model.init(r, v, method=model.encode_slices)
        )(jax.random.PRNGKey(1), jnp.asarray(slices, cfg.llm.dtype))["params"]
        params = {**lm_params, **vision_params}
    else:
        starts_np = np.full((B_plain,), off + 1, np.int32)
        images_np = np.broadcast_to(
            image, (B_plain,) + image.shape
        ).copy()
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.asarray(ids[:2]),
            images=jnp.asarray(images_np[:2], dtype),
            image_starts=jnp.asarray(starts_np[:2]),
        )["params"]

    engine = DecodeEngine(model, params, eos_id=-1, pad_id=0)
    params = engine.params
    max_len = -(-(Lp + 1) // 128) * 128
    run = engine._build(sp, 1)
    ids_d, mask_d = jnp.asarray(ids), jnp.asarray(mask)
    n_batches = -(-G // B_plain)

    if which == "minicpmv":
        encode = jax.jit(
            lambda p, v: model.apply({"params": p}, v,
                                     method=model.encode_slices)
        )
        slices_d = jnp.asarray(slices, cfg.llm.dtype)
        sstarts_d = jnp.asarray(np.stack([off + span_starts_1] * B_plain))

        def plain_once():
            # per fact: encode this fact's NS slices + full prefill
            for _ in range(n_batches):
                for _ in range(B_plain):
                    feats = encode(params, slices_d)
                spans = jnp.broadcast_to(
                    feats.reshape(1, NS, cfg.query_num, -1),
                    (B_plain, NS, cfg.query_num, feats.shape[-1]),
                )
                _, fl = run(params, ids_d, mask_d, None, None,
                            spans, sstarts_d, key, max_len=max_len)
            float(jnp.sum(fl[:, 0]))

        def shared_once():
            feats = np.asarray(encode(params, slices_d))
            return engine.score_shared_prefix(
                prefix.tolist(), suffixes,
                span_features=feats.reshape(NS, cfg.query_num, -1),
                span_starts=span_starts_1,
                batch_size=B_shared,
            )
    else:
        imgs_d = jnp.asarray(images_np, dtype)
        starts_d = jnp.asarray(starts_np)

        def plain_once():
            for _ in range(n_batches):
                _, fl = run(params, ids_d, mask_d, imgs_d, starts_d,
                            None, None, key, max_len=max_len)
            float(jnp.sum(fl[:, 0]))

        def shared_once():
            return engine.score_shared_prefix(
                prefix.tolist(), suffixes, image=image,
                image_start=image_start, batch_size=B_shared,
            )

    t_plain = _timeit(plain_once)
    logits_shared = shared_once()
    t_shared = _timeit(shared_once)

    print(json.dumps({
        "metric": f"int8_{which}_autocheck_shared_prefix_facts_per_sec",
        "value": round(G / t_shared, 2),
        "unit": "facts/s",
        "vs_baseline": None,
        "detail": {
            "model": desc,
            "facts_per_image": G,
            "prefix_len": P,
            "suffix_len": sfx_len,
            "plain_facts_per_sec": round(G / t_plain, 2),
            "shared_facts_per_sec": round(G / t_shared, 2),
            "speedup": round(t_plain / t_shared, 2),
            "batch_plain": B_plain,
            "batch_shared": B_shared,
            "logits_shape": list(np.asarray(logits_shared).shape),
            "platform": jax.devices()[0].platform,
        },
    }))


if __name__ == "__main__":
    main()
