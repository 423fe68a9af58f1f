"""int4 / int8 quantization drift at 7B geometry, structured synthetics.

VERDICT r4 #6: the int4 drift-gate thresholds (>=75% greedy agreement,
rel logit drift < 0.15 — tests/test_checkpoint_goldens.py) are guesses
until real weights exist (egress is still DNS-dead). This script puts a
floor under them with STRUCTURED synthetic weights that reproduce the
two properties that actually break low-bit transformer quantization:

  - per-output-channel scale spread (lognormal sigma ~0.5), and
  - rare outlier channels (0.3% of columns at ~8x scale — the LLM.int8 /
    AWQ observation).

It builds one llama block's worth of shapes at vicuna-7B geometry
(d=4096, I=11008), quantizes the same float weights to int8
(per-column) and packed int4 (group-128), and reports per-layer relative
output drift and TEACHER-FORCED next-token agreement + mean KL over a
shared 64-token sequence on a 4-layer model slice (free-running rollouts
on random synthetics measure chaos, not quantizer quality — see the
in-code note). Labeled synthetic — the gate thresholds get CALIBRATED the
moment real checkpoints load; this bounds how far off they can be.

BENCHID_TINY=1 (or non-TPU) shrinks geometry. Prints ONE JSON line.
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _structured(rng, K, N):
    """Float weights with per-column scale spread + outlier channels."""
    col_scale = np.exp(rng.normal(0.0, 0.5, size=(1, N)))
    n_out = max(int(0.003 * N), 1)
    outliers = rng.choice(N, size=n_out, replace=False)
    col_scale[0, outliers] *= 8.0
    w = rng.normal(0.0, 0.02, size=(K, N)).astype(np.float32) * col_scale
    return w.astype(np.float32)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp

    from rlaifv_tpu.models.convert import quantize_llm_int4, quantize_llm_int8
    from rlaifv_tpu.models.llama import LlamaConfig, LlamaForCausalLM
    from rlaifv_tpu.ops.int4_matmul import dequantize_int4, quantize_int4

    on_tpu = jax.devices()[0].platform == "tpu"
    tiny = os.environ.get("BENCHID_TINY", "") == "1" or not on_tpu
    rng = np.random.default_rng(0)

    # ---- per-layer drift on one 7B-geometry matmul
    K, N = (256, 256) if tiny else (4096, 11008)
    w = _structured(rng, K, N)
    x = rng.normal(0.0, 1.0, size=(16, K)).astype(np.float32)
    # activations get outlier channels too (the harder real-world case)
    x[:, rng.choice(K, size=max(int(0.003 * K), 1), replace=False)] *= 6.0

    ref = x @ w
    p4, s4 = quantize_int4(w, group=128 if K % 128 == 0 else K)
    w4 = np.asarray(dequantize_int4(jnp.asarray(p4), jnp.asarray(s4)))
    out4 = x @ w4
    q8 = np.clip(np.round(w / (np.abs(w).max(0) / 127.0)), -127, 127)
    w8 = q8 * (np.abs(w).max(0) / 127.0)
    out8 = x @ w8
    denom = np.abs(ref).max() + 1e-9
    layer_rel4 = float(np.abs(out4 - ref).max() / denom)
    layer_rel8 = float(np.abs(out8 - ref).max() / denom)

    # ---- end-to-end greedy agreement on a deep-enough model slice
    cfg_kw = dict(num_layers=2 if tiny else 4)
    if tiny:
        base_cfg = LlamaConfig.tiny(**cfg_kw)
    else:
        base_cfg = LlamaConfig.vicuna_7b(**cfg_kw)
    model = LlamaForCausalLM(base_cfg)
    ids = jnp.asarray(rng.integers(5, base_cfg.vocab_size - 1,
                                   size=(1, 32)).astype(np.int32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), ids)["params"]

    # replace projection kernels with structured synthetics (init gives
    # near-uniform fan-in scaling — too easy for a quantizer)
    def restructure(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                if set(v) >= {"kernel"} and np.ndim(v["kernel"]) == 2 \
                        and k != "lm_head":
                    kk, nn = v["kernel"].shape
                    out[k] = {**v, "kernel": _structured(rng, kk, nn)
                              * 0.6}
                else:
                    out[k] = restructure(v)
            else:
                out[k] = v
        return out

    params = restructure(params)
    # persistent ACTIVATION outlier channels (the AWQ premise): real LLMs
    # carry a handful of hot hidden channels through every layer; random
    # embeddings don't, which leaves smoothing nothing to migrate. Scale a
    # few embedding columns hot so the residual stream has them.
    emb = np.array(params["model"]["tok_embed"]["embedding"], np.float32)
    hot = rng.choice(emb.shape[1], size=max(emb.shape[1] // 256, 2),
                     replace=False)
    emb[:, hot] *= 10.0
    params["model"] = {**params["model"],
                       "tok_embed": {"embedding": emb}}
    # TEACHER-FORCED next-token agreement + mean KL over a shared token
    # sequence — free-running greedy rollouts on a random synthetic model
    # measure chaotic divergence, not quantizer quality (a first measured
    # run showed even int8, whose per-layer drift is ~1%, at 0.0 rollout
    # agreement at 7B width: random logits have near-zero argmax margins,
    # so ANY perturbation flips every step and errors compound). The
    # teacher-forced metrics are the standard quantization evals and
    # behave sanely on synthetics; real-checkpoint rollout quality stays
    # gated by tests/test_checkpoint_goldens.py once egress allows.
    import jax

    seq = jnp.asarray(rng.integers(5, base_cfg.vocab_size - 1,
                                   size=(1, 64)).astype(np.int32))

    def forced_logits(p, quant_bits=None):
        kw = {} if quant_bits is None else dict(
            quantize=True, quantize_bits=quant_bits, quantize_lm_head=False)
        m = LlamaForCausalLM(
            (LlamaConfig.tiny if tiny else LlamaConfig.vicuna_7b)(
                **cfg_kw, **kw)
        )
        out = jax.jit(lambda pp: m.apply({"params": pp}, seq)[0])(p)
        return np.asarray(out[0], np.float32)

    lf = forced_logits(params)
    l8 = forced_logits(quantize_llm_int8(params, include_lm_head=False), 8)
    l4 = forced_logits(quantize_llm_int4(params), 4)
    from rlaifv_tpu.models.quant_smooth import quantize_llm_int4_smooth

    l4s = forced_logits(quantize_llm_int4_smooth(model, params, ids), 4)

    def agree(a, b):
        return round(float((a.argmax(-1) == b.argmax(-1)).mean()), 3)

    def kl(a, b):
        pa = jax.nn.softmax(jnp.asarray(a))
        lb = jax.nn.log_softmax(jnp.asarray(b))
        la = jnp.log(jnp.maximum(pa, 1e-20))
        return round(float(jnp.mean(jnp.sum(pa * (la - lb), -1))), 4)

    print(json.dumps({
        "metric": "int4_forced_agreement_structured_synth",
        "value": agree(lf, l4),
        "unit": "fraction",
        "vs_baseline": None,
        "detail": {
            "geometry": "tiny" if tiny else "7b-slice-4layer",
            "int8_forced_agreement": agree(lf, l8),
            "int4_smooth_forced_agreement": agree(lf, l4s),
            "kl_int8": kl(lf, l8),
            "kl_int4": kl(lf, l4),
            "kl_int4_smooth": kl(lf, l4s),
            "layer_rel_drift_int4_g128": round(layer_rel4, 4),
            "layer_rel_drift_int8_percol": round(layer_rel8, 4),
            "note": "structured synthetic weights (lognormal col scales "
                    "+ 0.3% 8x outlier channels); calibrates the drift "
                    "gate until real checkpoints can load (egress dead)",
            "platform": jax.devices()[0].platform,
        },
    }))


if __name__ == "__main__":
    main()
