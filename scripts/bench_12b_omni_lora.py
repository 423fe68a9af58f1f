"""OmniLMM-12B-geometry QLoRA DPO on ONE v5e chip (BASELINE config 4).

The reference DPO-trains its 12B headline model (OmniLMM: EVA02-enormous
tower + perceiver resampler + Mistral-7B decoder) on an 8xA100 DeepSpeed
node (muffin/train/trainers.py:161-275, is_llava15=False branch). Here the
frozen base is weight-only int8 — EVA tower (4.4G) AND decoder (7G) — with
LoRA adapters through the no-merge 'lora' collection, remat on the decoder
and the compact LM head, so 12B DPO-LoRA fits a single 16G chip. Backward
never touches the tower (adapters live only in decoder attn/mlp, so XLA
prunes the tower's backward and drops its activations after the forward).

Prompt layout is the omni convention: literal <im_start><im_patch>*64
<im_end> span, features overwrite the span (train/family.py).

Prints ONE JSON line. Weights random; timing only (scan-differencing, see
bench.py). BENCH12B_TINY=1 (or non-TPU) smoke-runs the code path tiny.
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
    import dataclasses

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

    from rlaifv_tpu.data.collator import DPOCollator
    from rlaifv_tpu.models.eva02 import EvaConfig
    from rlaifv_tpu.models.llama import LlamaConfig
    from rlaifv_tpu.models.omnilmm import OmniLMMConfig, OmniLMMForCausalLM
    from rlaifv_tpu.train.lora import lora_init
    from rlaifv_tpu.train.train_step import (
        DPOTrainState,
        DPOHparams,
        OmnilmmDPOAdapter,
        make_lora_dpo_train_step,
    )
    from rlaifv_tpu.utils.synth import synth_omni_preference_pairs

    on_tpu = jax.devices()[0].platform == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    tiny = os.environ.get("BENCH12B_TINY", "") == "1" or not on_tpu
    bits = int(os.environ.get("BENCH12B_BITS", "8"))  # 8 | 4 (packed int4)
    if tiny:
        base = OmniLMMConfig.tiny()
        cfg = OmniLMMConfig(
            llm=dataclasses.replace(base.llm, quantize=True,
                                    quantize_bits=bits,
                                    quantize_lm_head=False),
            vision=dataclasses.replace(base.vision, quantize=True,
                                       quantize_bits=bits),
            num_query=base.num_query,
        )
        seq_len, n_pairs, r = 128, 1, 8
        q_len, a_len, patch_id = 8, 16, 250
    else:
        cfg = OmniLMMConfig(
            llm=LlamaConfig.mistral_7b(
                quantize=True, quantize_bits=bits, quantize_lm_head=False,
                remat=True, dtype=dtype, param_dtype=dtype,
            ),
            vision=EvaConfig.enormous(
                quantize=True, quantize_bits=bits, dtype=dtype,
                param_dtype=dtype,
            ),
            num_query=64,
        )
        # int4 halves the frozen base (11.6G int8 -> 5.8G): the freed HBM
        # buys the reference's FULL seq 2048 on one 16G chip
        seq_len = int(os.environ.get("BENCH12B_SEQ",
                                     2048 if bits == 4 else 1024))
        n_pairs = int(os.environ.get("BENCH12B_PAIRS", 2))
        r = int(os.environ.get("BENCH12B_R", 64))
        # 64-token image span + ~128-token question + 256-token answers
        q_len, a_len, patch_id = 128, 256, 31500

    model = OmniLMMForCausalLM(cfg)
    adapter = OmnilmmDPOAdapter(model)

    pairs = synth_omni_preference_pairs(
        cfg, n_pairs, answer_len=a_len, question_len=q_len,
        im_patch_id=patch_id, im_start_id=patch_id + 1,
        im_end_id=patch_id + 2,
    )
    coll = DPOCollator(pad_token_id=0, max_len=seq_len,
                       num_patches=cfg.num_image_tokens, bucket=None,
                       expand_images=False, image_patch_id=patch_id)
    batch = coll(pairs)
    n_valid = int((np.asarray(batch["labels"])[:, 1:] != -100).sum(-1).max())
    compact_len = int(np.ceil(max(n_valid, 64) / 64) * 64)

    # shared-prefix paired forward at the FULL common prompt (bench rows
    # all share span+question; the trainer's image-end rule is the
    # conservative any-batch bound), suffix trimmed to the answers
    from rlaifv_tpu.train.train_step import validate_shared_prefix

    shared_prefix = 0
    shared_suffix = 0
    if os.environ.get("BENCH12B_PREFIX", "auto") == "auto":
        ids = np.asarray(batch["input_ids"])
        eq = ids[:n_pairs] == ids[n_pairs:]
        full = eq.all(axis=1)
        firsts = np.where(full, ids.shape[1], np.argmin(eq, axis=1))
        shared_prefix = int(firsts.min())
        if shared_prefix > 0:
            labels_np = np.asarray(batch["labels"])
            last = int(np.max(np.where(labels_np != -100)[1])) + 1
            shared_suffix = min(
                -(-max(last - shared_prefix, 1) // 128) * 128,
                seq_len - shared_prefix,
            )
            validate_shared_prefix(batch, shared_prefix,
                                   cfg.num_image_tokens,
                                   suffix_len=shared_suffix)

    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    init = jax.jit(model.init)
    params = init(
        jax.random.PRNGKey(0),
        batch["input_ids"][:1],
        images=batch["images"][:1],
        image_starts=batch["image_starts"][:1],
    )["params"]

    lora = lora_init(jax.random.PRNGKey(1), params, r=r)
    n_adapter = sum(int(np.prod(x.shape))
                    for x in jax.tree_util.tree_leaves(lora))
    n_base = sum(int(np.prod(x.shape))
                 for x in jax.tree_util.tree_leaves(params))

    hp = DPOHparams(beta=0.1, lm_head_impl="compact",
                    compact_len=compact_len,
                    shared_prefix_len=shared_prefix,
                    shared_suffix_len=shared_suffix)
    opt = optax.adamw(1e-5, weight_decay=0.0, mu_dtype=jnp.bfloat16)
    state = DPOTrainState(jnp.int32(0), lora, opt.init(lora))
    step_fn = make_lora_dpo_train_step(adapter, opt, hp, lora_alpha=16.0)

    def make_runner(k):
        @partial(jax.jit, donate_argnums=0, static_argnums=3)
        def run(state, base, batch, k):
            def body(st, _):
                st, m = step_fn(st, base, batch)
                return st, m["loss"]

            st, losses = jax.lax.scan(body, state, None, length=k)
            return st, losses[-1]

        return lambda s: run(s, params, batch, k)

    k_small, k_big = (1, 4) if on_tpu else (1, 2)
    run_small, run_big = make_runner(k_small), make_runner(k_big)

    def timed(run):
        nonlocal state
        t0 = time.perf_counter()
        state, l = run(state)
        float(l)
        return time.perf_counter() - t0

    timed(run_small)
    timed(run_big)
    reps = 1 if tiny else 3
    t_small = min(timed(run_small) for _ in range(reps))
    t_big = min(timed(run_big) for _ in range(reps))
    dt = (t_big - t_small) / (k_big - k_small)

    pairs_per_sec = n_pairs / dt
    print(json.dumps({
        "metric": "qlora12b_omni_dpo_pairs_per_sec_per_chip",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/s",
        "vs_baseline": None,
        "detail": {
            "model": ("omnilmm-12b-geometry (EVA02-enormous + resampler + "
                      "mistral-7b)") if not tiny else "tiny-smoke",
            "base": f"int{bits} weight-only tower AND decoder (bf16 head)",
            "n_base_params": n_base,
            "adapters": f"lora r={r} ({n_adapter / 1e6:.0f}M params)",
            "seq_len": seq_len,
            "shared_prefix": shared_prefix,
            "shared_suffix": shared_suffix,
            "pairs_per_batch": n_pairs,
            "step_ms": round(dt * 1e3, 1),
            "note": "BASELINE config 4's model trained on ONE 16G chip — "
                    "the reference recipe needs an 8xA100 DeepSpeed node",
            "platform": jax.devices()[0].platform,
        },
    }))


if __name__ == "__main__":
    main()
