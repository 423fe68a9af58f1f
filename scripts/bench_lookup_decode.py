"""Prompt-lookup decoding vs plain greedy: single-stream decode latency.

The decode ladder's post-int4 rung (genai/lookup_decode.py): verify k
draft tokens with ONE (k+1)-token window forward. Decode is
weight-bandwidth-bound, so the window costs barely more than a 1-token
step — every accepted draft is a ~free token. This bench measures the
two hardware truths on the serving geometry (llama3-8B shape, int8 base,
bf16 KV, B=1 — the reference's divide-and-conquer / chat stream):

  plain_step_ms    one-token decode step
  window_step_ms   (k+1)-token verify window
  breakeven        window/plain — tokens/step needed to tie

and reports the measured tokens_per_step of the synthetic run SEPARATELY
(random/zero weights cycle, so synthetic acceptance is optimistic; real
acceptance is workload-dependent — divide-and-conquer quotes long answer
spans, the best case). tok/s improvement on a real workload =
tokens_per_step(workload) / breakeven.

BENCHLD_TINY=1 (or non-TPU) smoke-runs the same code path. Prints ONE
JSON line.
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
    from rlaifv_tpu.genai.lookup_decode import lookup_generate
    from rlaifv_tpu.genai.sampling import SamplingParams
    from rlaifv_tpu.models.llama import LlamaConfig, LlamaForCausalLM

    on_tpu = jax.devices()[0].platform == "tpu"
    tiny = os.environ.get("BENCHLD_TINY", "") == "1" or not on_tpu
    k = int(os.environ.get("BENCHLD_K", "7"))
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    if tiny:
        cfg = LlamaConfig.tiny(quantize=True, quantize_lm_head=False)
        Lp, max_new = 24, 24
    else:
        # llama3-8B geometry, int8 base, bf16 KV (lookup needs the
        # per-layer window path; B=1 cache is small so bf16 KV fits)
        cfg = LlamaConfig.llama3_8b(
            quantize=True, quantize_lm_head=False,
            dtype=dtype, param_dtype=dtype,
        )
        Lp, max_new = 512, 128

    model = LlamaForCausalLM(cfg)
    rng = np.random.default_rng(0)
    # quotable prompt: repeated n-grams emulate divide-and-conquer input
    base = rng.integers(5, cfg.vocab_size - 1, size=max(Lp // 4, 4))
    prompt = list(map(int, np.tile(base, 5)[:Lp]))
    ids = jnp.asarray(np.asarray(prompt, np.int32)[None])

    params = jax.jit(model.init)(jax.random.PRNGKey(0), ids)["params"]
    engine = DecodeEngine(model, params, eos_id=-1, pad_id=0)

    # ---- plain greedy per-step cost: difference two max_new settings
    def plain(max_new_t):
        res = engine.generate([prompt], sampling=SamplingParams.greedy(),
                              max_new_tokens=max_new_t,
                              prompt_bucket=Lp)
        return res

    n_small, n_big = (2, max_new) if on_tpu else (2, 8)
    plain(n_small), plain(n_big)  # compile both

    def t_plain(n):
        t0 = time.perf_counter()
        r = plain(n)
        int(r.lengths[0])  # host fetch = sync
        return time.perf_counter() - t0

    ts = min(t_plain(n_small) for _ in range(3))
    tb = min(t_plain(n_big) for _ in range(3))
    plain_step_ms = (tb - ts) / (n_big - n_small) * 1000

    # ---- lookup: per-window cost + synthetic acceptance
    def look(max_new_t):
        return lookup_generate(engine, prompt, max_new_tokens=max_new_t,
                               draft_len=k, ngram=2)

    look(n_small), look(n_big)  # compile

    def t_look(n):
        t0 = time.perf_counter()
        r = look(n)  # lookup_generate fetches out_n/steps = sync
        return time.perf_counter() - t0, r

    ts2 = min(t_look(n_small)[0] for _ in range(3))
    best = None
    for _ in range(3):
        dt, r = t_look(n_big)
        if best is None or dt < best[0]:
            best = (dt, r)
    tb2, res_big = best
    _, res_small = t_look(n_small)
    d_steps = max(res_big.n_steps - res_small.n_steps, 1)
    window_step_ms = (tb2 - ts2) / d_steps * 1000
    breakeven = window_step_ms / max(plain_step_ms, 1e-9)

    tok_s_plain = 1000.0 / max(plain_step_ms, 1e-9)
    tok_s_lookup_synth = res_big.tokens_per_step * 1000.0 / max(
        window_step_ms, 1e-9
    )

    print(json.dumps({
        "metric": "lookup_decode_breakeven_tokens_per_step",
        "value": round(breakeven, 3),
        "unit": "tokens/step",
        "vs_baseline": None,
        "detail": {
            "geometry": "tiny" if tiny else "llama3-8b-int8",
            "draft_len": k,
            "plain_step_ms": round(plain_step_ms, 3),
            "window_step_ms": round(window_step_ms, 3),
            "tok_s_plain_b1": round(tok_s_plain, 1),
            "synthetic_tokens_per_step": res_big.tokens_per_step,
            "synthetic_tok_s_lookup_b1": round(tok_s_lookup_synth, 1),
            "note": "synthetic acceptance is optimistic (degenerate "
                    "weights cycle); real tok/s gain = workload "
                    "tokens_per_step / breakeven",
            "platform": jax.devices()[0].platform,
        },
    }))


if __name__ == "__main__":
    main()
