"""Continuous batching vs fixed-batch diverse-gen throughput on the chip.

Workload model: the reference diverse-gen setting (bs=8-64, T=0.7, max 512
new tokens) with a realistic skewed answer-length distribution (lognormal,
median ~85 tokens, clipped to [8, 512]) injected via per-prompt budgets —
random weights never emit EOS, so budgets stand in for natural stopping.

Fixed-batch baseline = DecodeEngine.generate per batch in arrival order
(reference llava15_gen_data semantics: every row waits for the batch max;
the early exit only fires when ALL rows are done, which is exactly the
per-batch max budget here, so eos_id=-1 timing is faithful).

Timing uses wall-clock around full host-synchronized calls (np.asarray of
results forces the fetch), since both paths are multi-call host loops — the
tunnel RPC overhead is part of both fairly.

Usage: python scripts/perf_continuous.py [n_prompts] [slots]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

    from rlaifv_tpu.genai.continuous import ContinuousGenerator
    from rlaifv_tpu.genai.engine import DecodeEngine
    from rlaifv_tpu.genai.sampling import SamplingParams
    from rlaifv_tpu.models.llama import LlamaConfig, LlamaForCausalLM

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    # bench.py's 470M-proxy LLM geometry
    cfg = LlamaConfig(
        vocab_size=32000, hidden_size=1536, intermediate_size=4096,
        num_layers=12, num_heads=12, num_kv_heads=12,
        max_position_embeddings=2048, remat=False,
        dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
    )
    model = LlamaForCausalLM(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))[
        "params"
    ]
    engine = DecodeEngine(model, params, eos_id=-1, pad_id=0)

    rng = np.random.default_rng(0)
    max_new = 512
    prompt_len = 64
    prompts = [list(rng.integers(3, 30000, size=prompt_len)) for _ in range(N)]
    budgets = np.clip(
        rng.lognormal(mean=4.45, sigma=0.8, size=N), 8, max_new
    ).astype(np.int32)
    print(f"N={N} B={B} budgets: median={np.median(budgets):.0f} "
          f"mean={budgets.mean():.0f} max={budgets.max()} "
          f"total={budgets.sum()}")
    sp = SamplingParams(temperature=0.7, do_sample=True)

    # ---- continuous
    gen = ContinuousGenerator(
        engine, slots=B, chunk=32, max_new_tokens=max_new,
        sampling=sp, prompt_bucket=64,
    )
    gen.run(prompts[:B], max_new_per_prompt=budgets[:B])  # warm compile
    t0 = time.perf_counter()
    res = gen.run(prompts, max_new_per_prompt=budgets)
    t_cont = time.perf_counter() - t0
    assert (np.asarray(res.lengths) == budgets).all()
    print(f"continuous: {t_cont:.2f}s  {budgets.sum()/t_cont:.1f} tok/s")

    # ---- fixed batches, arrival order (reference semantics)
    def fixed_run():
        outs = []
        for i in range(0, N, B):
            bb = budgets[i : i + B]
            r = engine.generate(
                prompts[i : i + B], sampling=sp,
                max_new_tokens=int(bb.max()), prompt_bucket=64,
                seed=i,
            )
            outs.append(np.asarray(r.tokens))
        return outs

    fixed_run()  # warm compile (one graph per distinct batch max budget)
    t0 = time.perf_counter()
    fixed_run()
    t_fixed = time.perf_counter() - t0
    print(f"fixed:      {t_fixed:.2f}s  {budgets.sum()/t_fixed:.1f} tok/s")
    print(f"speedup: {t_fixed / t_cont:.2f}x")


if __name__ == "__main__":
    main()
