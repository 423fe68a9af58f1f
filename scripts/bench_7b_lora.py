"""7B-geometry QLoRA DPO on ONE v5e chip — the capability the reference
cannot express: its 7B DPO recipe needs an 8xA100 DeepSpeed node
(script/train/llava15_train.sh), and its LoRA path still materializes the
full bf16 model. Here the frozen base is weight-only int8 (QuantDense +
differentiable dx kernel, ops/quant_matmul.py), adapters apply through the
no-merge 'lora' collection (models/llama.py::LoraDense), activations remat,
and the LM head runs compact — so LLaVA-1.5-7B-geometry DPO-LoRA fits a
single 16G chip.

Prints ONE JSON line. Timing uses the scan-differencing method from
bench.py (the axon tunnel returns before the device finishes; only a host
fetch syncs).

Weights are randomly-shaped (int8 zeros + unit scales): timing is
weight-value independent; this measures throughput, not quality.
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
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

    from rlaifv_tpu.models.clip_vit import CLIPVisionConfig
    from rlaifv_tpu.models.llama import LlamaConfig
    from rlaifv_tpu.models.llava import LlavaConfig, LlavaForCausalLM
    from rlaifv_tpu.train.lora import lora_init
    from rlaifv_tpu.train.train_step import (
        DPOHparams,
        DPOTrainState,
        LlavaDPOAdapter,
        make_lora_dpo_train_step,
    )
    from rlaifv_tpu.utils.synth import llava_flops_per_pair, synth_dpo_batch

    on_tpu = jax.devices()[0].platform == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    tiny = os.environ.get("BENCH7B_TINY", "") == "1" or not on_tpu
    if tiny:  # CPU smoke: same code path, toy geometry
        llm = LlamaConfig.tiny(quantize=True, quantize_lm_head=False)
        vision = CLIPVisionConfig.tiny() if hasattr(CLIPVisionConfig, "tiny") \
            else CLIPVisionConfig(image_size=28, patch_size=14, hidden_size=32,
                                  intermediate_size=64, num_layers=2,
                                  num_heads=2)
        seq_len, n_pairs, r = 128, 1, 8
    else:
        # LLaVA-1.5-7B geometry: Vicuna-7B + CLIP-L/14-336
        llm = LlamaConfig.vicuna_7b(
            quantize=True, quantize_lm_head=False, remat=True,
            dtype=dtype, param_dtype=dtype,
        )
        vision = CLIPVisionConfig(
            image_size=336, patch_size=14, hidden_size=1024,
            intermediate_size=4096, num_layers=24, num_heads=16,
            dtype=dtype, param_dtype=dtype,
        )
        seq_len = int(os.environ.get("BENCH7B_SEQ", 2048))
        n_pairs = int(os.environ.get("BENCH7B_PAIRS", 2))
        r = int(os.environ.get("BENCH7B_R", 64))  # ref llava15_train_lora.sh

    cfg = LlavaConfig(llm=llm, vision=vision)
    model = LlavaForCausalLM(cfg)
    adapter = LlavaDPOAdapter(model)

    batch = synth_dpo_batch(cfg, n_pairs=n_pairs, max_len=seq_len,
                            answer_len=256 if not tiny else 32)
    n_valid = int((np.asarray(batch["labels"])[:, 1:] != -100).sum(-1).max())
    compact_len = int(np.ceil(max(n_valid, 64) / 64) * 64)

    # BENCH7B_PREFIX=auto|<int>|0: shared-prefix paired forward — the pair's
    # prompt prefix runs ONCE (train/paired_forward.py). auto = the full
    # common prompt (validated like the trainer does).
    prefix_env = os.environ.get("BENCH7B_PREFIX", "0")
    shared_suffix = 0
    if prefix_env == "auto":
        ids = np.asarray(batch["input_ids"])
        eq = ids[:n_pairs] == ids[n_pairs:]
        full = eq.all(axis=1)
        firsts = np.where(full, ids.shape[1], np.argmin(eq, axis=1))
        shared_prefix = int(firsts.min())
        # suffix trim: carry only up to the last supervised label, rounded
        # up to a flash-block multiple (exact: causal logps of kept
        # positions never depend on dropped later padding)
        labels_np = np.asarray(batch["labels"])
        last = int(np.max(np.where(labels_np != -100)[1])) + 1
        shared_suffix = min(
            -(-max(last - shared_prefix, 1) // 128) * 128,
            seq_len - shared_prefix,
        )
    else:
        shared_prefix = int(prefix_env)
    if shared_prefix > 0:
        from rlaifv_tpu.train.train_step import validate_shared_prefix

        validate_shared_prefix(batch, shared_prefix, cfg.num_image_tokens,
                               suffix_len=shared_suffix)

    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    # init the 7B base ON DEVICE (host->device through the tunnel is
    # ~20 MB/s; 7 GB of int8 would take minutes)
    init = jax.jit(model.init)
    # batch-of-1 init: images are per-pair while ids/starts are per-row, so
    # [:1] is the only slice consistent for every n_pairs
    params = init(
        jax.random.PRNGKey(0),
        batch["input_ids"][:1],
        images=batch["images"][:1],
        image_starts=batch["image_starts"][:1],
    )["params"]

    lora = lora_init(jax.random.PRNGKey(1), params, r=r)
    n_adapter = sum(int(np.prod(x.shape))
                    for x in jax.tree_util.tree_leaves(lora))

    hp = DPOHparams(beta=0.1, lm_head_impl="compact", compact_len=compact_len,
                    shared_prefix_len=shared_prefix,
                    shared_suffix_len=shared_suffix)
    # ref LoRA lr llava15_train_lora.sh:31; bf16 first moment frees ~320M
    # of HBM on 160M adapters (4 pairs/batch was 195M over capacity)
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
    reps = 1 if tiny else 3  # CPU interpret-mode smoke: one rep is plenty
    t_small = min(timed(run_small) for _ in range(reps))
    t_big = min(timed(run_big) for _ in range(reps))
    dt = (t_big - t_small) / (k_big - k_small)

    pairs_per_sec = n_pairs / dt
    fpp = llava_flops_per_pair(cfg, seq_len)
    peak = 197e12 if on_tpu else 1e12
    mfu = pairs_per_sec * fpp / peak
    # analytic reference: the same model on A100 at a generous 45% MFU
    a100 = 0.45 * 312e12 / fpp
    print(json.dumps({
        "metric": "qlora7b_dpo_pairs_per_sec_per_chip",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / a100, 3),
        "detail": {
            "model": "llava15-7b-geometry" if not tiny else "tiny-smoke",
            "base": "int8 weight-only (bf16 head)",
            "adapters": f"lora r={r} ({n_adapter/1e6:.0f}M params)",
            "seq_len": seq_len,
            "shared_prefix": shared_prefix,
            "shared_suffix": shared_suffix,
            "pairs_per_batch": n_pairs,
            "step_ms": round(dt * 1e3, 1),
            "mfu_ref_flops": round(mfu, 3),
            "platform": jax.devices()[0].platform,
        },
    }))


if __name__ == "__main__":
    main()
