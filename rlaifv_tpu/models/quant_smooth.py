"""Activation-aware smoothing for int4 quantization (AWQ/SmoothQuant).

Group-128 int4 (ops/int4_matmul.py) loses the most where activations
carry rare large channels (the LLM.int8 observation): one outlier column
inflates a whole group's scale. The classic fix (AWQ, arXiv:2306.00978;
SmoothQuant, arXiv:2211.10438) migrates that difficulty into the weights
BEFORE quantization with a per-in-channel scale s:

    y = (x / s) @ (W * s[:, None])        — mathematically identical

and the division by s folds EXACTLY into the producer of x, so runtime
cost is zero:

  - q/k/v_proj and gate/up_proj read an RMSNorm output: gamma' = gamma/s.
  - down_proj reads silu(gate) * up, which is LINEAR in up: scaling
    up_proj's output columns by 1/s scales down's input channels by 1/s.
    The column scaling is absorbed bit-exactly by up's own per-(group,
    column) quantization scales — quantized integers are unchanged.
  - o_proj is left unsmoothed: its input is a softmax-convex combination
    of v rows (outliers already averaged down), and the v-side fold
    would couple into RoPE'd attention numerics for no measured gain
    (AWQ finds o least sensitive too).

s_k = amax_x(k)^alpha / amax_w(k)^(1-alpha), geometric-mean-normalized
(the SmoothQuant form; alpha=0.5 default). Calibration statistics come
from `collect_llm_act_amax` — one forward over a calibration batch with
flax capture_intermediates limited to the three producer modules.

Reference surface: this upgrades the loader's `load_4bit` path
(ref llava/model/builder.py:30-49 uses bitsandbytes nf4, whose
double-quantization plays the same robustness role).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Tree = Dict[str, Any]

_CAPTURE = ("ln_attn", "ln_mlp", "gate_proj", "up_proj", "gate_up_proj")


def collect_llm_act_stats(model, params: Tree, ids,
                          max_rows: int = 256) -> Tree:
    """Calibration ACTIVATIONS for the smoothable projections: up to
    `max_rows` token rows of each producer's output, flattened to (T, K).

    Runs `model` (a bare LlamaForCausalLM) over `ids` (B, L) capturing
    only the producer modules' outputs. Returns
    {"layer_i": {"attn_in": (T, D), "mlp_in": (T, D), "down_in": (T, I)}}.
    """
    def keep(mdl, method_name):
        return method_name == "__call__" and mdl.name in _CAPTURE

    _, state = model.apply(
        {"params": params}, jnp.asarray(ids),
        capture_intermediates=keep, mutable=["intermediates"],
    )
    inter = state["intermediates"]
    # bare LM: {"model": {"layer_i": {...}}}
    layers = inter["model"]

    def rows(t):
        flat = np.asarray(t.astype(jnp.float32)).reshape(-1, t.shape[-1])
        return flat[:max_rows]

    out = {}
    for lname, mods in layers.items():
        if not lname.startswith("layer_"):
            continue
        rec = {
            "attn_in": rows(mods["ln_attn"]["__call__"][0]),
            "mlp_in": rows(mods["ln_mlp"]["__call__"][0]),
        }
        mlp = mods.get("mlp", {})
        if "gate_up_proj" in mlp:
            gu = mlp["gate_up_proj"]["__call__"][0].astype(jnp.float32)
            I = gu.shape[-1] // 2
            down_in = jax.nn.silu(gu[..., :I]) * gu[..., I:]
        else:
            g = mlp["gate_proj"]["__call__"][0].astype(jnp.float32)
            u = mlp["up_proj"]["__call__"][0].astype(jnp.float32)
            down_in = jax.nn.silu(g) * u
        rec["down_in"] = rows(down_in)
        out[lname] = rec
    return out


def collect_llm_act_amax(model, params: Tree, ids) -> Tree:
    """Back-compat wrapper: per-channel |act| maxima (see
    collect_llm_act_stats)."""
    stats = collect_llm_act_stats(model, params, ids)
    return {
        ln: {k: np.abs(v).max(axis=0) for k, v in rec.items()}
        for ln, rec in stats.items()
    }


def _quant_dequant(w: np.ndarray) -> np.ndarray:
    """Group-128 int4 quantize->dequantize in numpy (the weight half of
    the alpha-search error model; mirrors ops/int4_matmul.quantize_int4)."""
    K, N = w.shape
    g = 128 if K % 128 == 0 else K
    wg = w.reshape(K // g, g, N)
    scale = np.maximum(np.abs(wg).max(axis=1), 1e-8) / 7.0
    q = np.clip(np.round(wg / scale[:, None, :]), -7, 7)
    return (q * scale[:, None, :]).reshape(K, N).astype(np.float32)


def _act_quant(x: np.ndarray) -> np.ndarray:
    """Rowwise symmetric int8 quantize->dequantize — the kernel's
    activation contract (ops/int4_matmul int8 prequant). Smoothing's x/s
    changes THIS error too (migrating difficulty into x), so the search
    must score it or it optimizes the wrong objective."""
    s = np.maximum(np.abs(x).max(axis=1, keepdims=True), 1e-20) / 127.0
    return np.clip(np.round(x / s), -127, 127) * s


_ALPHAS = (0.0, 0.25, 0.5, 0.75)


def _search_scale(x: np.ndarray, kernels, alpha) -> np.ndarray:
    """s for one producer group. alpha=None: grid-search _ALPHAS for the
    s minimizing the summed quantized-output MSE on the calibration
    activations, with BOTH error sources the runtime has (group-int4
    weights AND rowwise-int8 activations) — alpha=0 (s=1, plain group
    quant) is always a candidate, so search-mode smoothing is never worse
    than no smoothing ON THE CALIBRATION BATCH (the AWQ procedure,
    arXiv:2306.00978 §3.2, extended with the act-quant term). A float
    alpha pins the classic fixed-exponent formula."""
    act_amax = np.abs(x).max(axis=0)
    w_amax = np.max(np.stack([np.abs(w).max(axis=1) for w in kernels]),
                    axis=0)
    if alpha is not None:
        return _smooth_scale(act_amax, w_amax, alpha)
    best, best_err = None, None
    for a in _ALPHAS:
        s = _smooth_scale(act_amax, w_amax, a)
        xs = _act_quant(x / s[None, :])
        err = 0.0
        for w in kernels:
            ref = x @ w
            got = xs @ _quant_dequant(w * s[:, None])
            err += float(((got - ref) ** 2).mean())
        if best_err is None or err < best_err:
            best, best_err = s, err
    return best


def _smooth_scale(act_amax: np.ndarray, w_amax: np.ndarray,
                  alpha: float) -> np.ndarray:
    a = np.maximum(np.asarray(act_amax, np.float64), 1e-8)
    w = np.maximum(np.asarray(w_amax, np.float64), 1e-8)
    s = a ** alpha / w ** (1.0 - alpha)
    s = s / np.exp(np.mean(np.log(s)))  # geometric mean 1: pure migration
    return np.clip(s, 1e-3, 1e3).astype(np.float32)


def smooth_llm_for_int4(llm_params: Tree, act_stats: Tree,
                        alpha=None) -> Tree:
    """Float param tree -> float param tree with the smoothing folds
    applied. Model outputs are mathematically unchanged (fp32 identical
    up to reassociation); quantize AFTER this, fuse after that.

    act_stats: collect_llm_act_stats (sample activations, (T, K) per
    producer — enables the per-layer alpha grid search, the default) or
    collect_llm_act_amax (amax vectors — fixed-alpha formula only).
    alpha=None: grid search when activations are available (never worse
    than plain quantization on the calibration batch), else 0.5."""
    params = jax.tree.map(lambda x: np.asarray(x, np.float32), llm_params)
    model = params["model"]
    for lname, stats in act_stats.items():
        layer = model[lname]
        attn, mlp = layer["attn"], layer["mlp"]

        def wk(mod):  # (K, N) kernel
            return mod["kernel"]

        def scale_for(key, kernels):
            a = np.asarray(stats[key], np.float32)
            if a.ndim == 1:  # amax-only stats: fixed-alpha formula
                w_amax = np.max(
                    np.stack([np.abs(w).max(axis=1) for w in kernels]),
                    axis=0,
                )
                return _smooth_scale(a, w_amax,
                                     0.5 if alpha is None else alpha)
            return _search_scale(a, kernels, alpha)

        # ---- qkv (shared RMSNorm producer -> one joint s)
        qkv_mods = ([attn["qkv_proj"]] if "qkv_proj" in attn
                    else [attn["q_proj"], attn["k_proj"], attn["v_proj"]])
        s = scale_for("attn_in", [wk(m) for m in qkv_mods])
        layer["ln_attn"]["scale"] = layer["ln_attn"]["scale"] / s
        for m in qkv_mods:
            m["kernel"] = wk(m) * s[:, None]

        # ---- gate/up (shared ln_mlp producer)
        gu_mods = ([mlp["gate_up_proj"]] if "gate_up_proj" in mlp
                   else [mlp["gate_proj"], mlp["up_proj"]])
        s = scale_for("mlp_in", [wk(m) for m in gu_mods])
        layer["ln_mlp"]["scale"] = layer["ln_mlp"]["scale"] / s
        for m in gu_mods:
            m["kernel"] = wk(m) * s[:, None]

        # ---- down (producer = up's output columns; linear in up)
        s = scale_for("down_in", [wk(mlp["down_proj"])])
        mlp["down_proj"]["kernel"] = wk(mlp["down_proj"]) * s[:, None]
        if "gate_up_proj" in mlp:
            k = mlp["gate_up_proj"]["kernel"]
            I = k.shape[1] // 2
            mlp["gate_up_proj"]["kernel"] = np.concatenate(
                [k[:, :I], k[:, I:] / s[None, :]], axis=1
            )
        else:
            mlp["up_proj"]["kernel"] = mlp["up_proj"]["kernel"] / s[None, :]
    return params


def quantize_llm_int4_smooth(model, llm_params: Tree, calib_ids,
                             alpha=None,
                             act_amax: Optional[Tree] = None) -> Tree:
    """Calibrate (one forward over calib_ids) -> smooth (per-layer alpha
    grid search by default) -> group-128 packed int4
    (convert.quantize_llm_int4 layout). Pass `act_amax` (amax vectors or
    full act stats) to reuse recorded statistics instead of running
    calibration."""
    from rlaifv_tpu.models.convert import quantize_llm_int4

    if act_amax is None:
        act_amax = collect_llm_act_stats(model, llm_params, calib_ids)
    smoothed = smooth_llm_for_int4(llm_params, act_amax, alpha)
    return quantize_llm_int4(smoothed)


def smooth_quantize_for_serving(llm_cfg, llm_params: Tree, tokenizer=None,
                                alpha: float = 0.5) -> Tree:
    """Serving-loader convenience: float llm subtree -> smoothed packed
    int4. `llm_cfg` may be the serving config (quantize/fuse flags are
    stripped for the calibration model); calibration ids come from the
    tokenizer when it can encode text, else a deterministic id ramp
    (statistically weak but mechanically sound — real-text calibration
    needs real checkpoints, which are still egress-blocked)."""
    import dataclasses

    from rlaifv_tpu.models.llama import LlamaForCausalLM

    cfg_f = dataclasses.replace(llm_cfg, quantize=False, fuse_proj=False)
    ids = None
    if tokenizer is not None:
        try:
            enc = tokenizer(
                "A chat between a curious user and an artificial "
                "intelligence assistant. The assistant gives helpful "
                "answers to the user's questions."
            )
            raw = enc["input_ids"] if isinstance(enc, dict) else enc
            arr = np.asarray(raw, np.int32)
            ids = arr[None] if arr.ndim == 1 else arr
        except Exception:
            ids = None
    if ids is None:
        ids = (np.arange(48, dtype=np.int32)[None]
               % max(cfg_f.vocab_size - 2, 2)) + 1
    ids = np.clip(ids, 0, cfg_f.vocab_size - 1)
    return quantize_llm_int4_smooth(LlamaForCausalLM(cfg_f), llm_params,
                                    ids, alpha)
