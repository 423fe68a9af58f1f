"""AWQ-style smoothing: exact-fold invariance + int4 drift improvement.

The smoothing transform must be a mathematical identity on the float
model (all folds exact), and must measurably shrink int4 quantization
drift on outlier-structured weights/activations — the whole reason it
exists (drift-script signal: group-128 int4 loses greedy agreement on
structured synthetics while int8 stays exact).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rlaifv_tpu.models.convert import quantize_llm_int4
from rlaifv_tpu.models.llama import LlamaConfig, LlamaForCausalLM
from rlaifv_tpu.models.quant_smooth import (
    collect_llm_act_amax,
    quantize_llm_int4_smooth,
    smooth_llm_for_int4,
)
from rlaifv_tpu.ops.int4_matmul import dequantize_int4


def _structured_params(cfg, seed=0):
    """Init params, then re-draw projection kernels with per-IN-channel
    (row) scale spread + row outliers — the axis group/per-column int4
    scales cannot absorb (a hot row inflates its whole group's scale),
    and exactly the imbalance smoothing migrates."""
    model = LlamaForCausalLM(cfg)
    ids = jnp.ones((1, 8), jnp.int32)
    params = jax.tree.map(
        lambda x: np.asarray(x, np.float32),
        model.init(jax.random.PRNGKey(seed), ids)["params"],
    )
    rng = np.random.default_rng(seed + 1)

    def walk(node, name):
        if isinstance(node, dict):
            if "kernel" in node and np.ndim(node["kernel"]) == 2 \
                    and name != "lm_head":
                K, N = node["kernel"].shape
                # mild enough that a 2-layer model's drift stays in a
                # discriminative regime (extreme outliers saturate the
                # logit drift near 1.0 for every quantizer)
                row = np.exp(rng.normal(0, 0.4, size=(K, 1)))
                row[rng.choice(K, size=max(K // 32, 1),
                               replace=False)] *= 4.0
                node = dict(node)
                node["kernel"] = (
                    rng.normal(0, 0.04, size=(K, N)) * row
                ).astype(np.float32)
                return node
            return {k: walk(v, k) for k, v in node.items()}
        return node

    return model, walk(params, "")


def test_smoothing_is_exact_fold():
    cfg = LlamaConfig.tiny()
    model, params = _structured_params(cfg)
    ids = jnp.asarray(
        np.random.default_rng(3).integers(5, cfg.vocab_size - 1,
                                          size=(2, 12)), jnp.int32
    )
    want = model.apply({"params": params}, ids)[0]

    stats = collect_llm_act_amax(model, params, ids)
    assert set(stats) == {f"layer_{i}" for i in range(cfg.num_layers)}
    smoothed = smooth_llm_for_int4(params, stats, alpha=0.5)
    got = model.apply({"params": smoothed}, ids)[0]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


def test_smoothing_reduces_int4_drift():
    """End-to-end: dequantized-int4 logits drift less from float after
    smoothing, on outlier-structured weights with outlier activations."""
    cfg = LlamaConfig.tiny()
    model, params = _structured_params(cfg, seed=7)
    rng = np.random.default_rng(11)
    ids = jnp.asarray(rng.integers(5, cfg.vocab_size - 1, size=(2, 16)),
                      jnp.int32)
    ref = np.asarray(model.apply({"params": params}, ids)[0], np.float32)

    def dequant_tree(q, f):
        out = {}
        for k, v in f.items():
            qq = q[k]
            if isinstance(v, dict):
                if isinstance(qq, dict) and "scale" in qq \
                        and np.ndim(qq["scale"]) == 2:
                    out[k] = {"kernel": np.asarray(dequantize_int4(
                        jnp.asarray(qq["kernel"]), jnp.asarray(qq["scale"])
                    ))}
                else:
                    out[k] = dequant_tree(qq, v)
            else:
                out[k] = v
        return out

    def drift(ptree):
        out = np.asarray(model.apply({"params": ptree}, ids)[0], np.float32)
        return float(np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9))

    plain = quantize_llm_int4(params)
    stats = collect_llm_act_amax(model, params, ids)
    smooth_q = quantize_llm_int4_smooth(model, params, None,
                                        act_amax=stats)
    # evaluate both against the ORIGINAL float model: the smoothed tree's
    # dequantized weights fold back through the adjusted gammas/columns
    d_plain = drift(dequant_tree(plain, params))
    smoothed_f = smooth_llm_for_int4(params, stats)
    d_smooth = drift(dequant_tree(smooth_q, smoothed_f))
    assert d_smooth < d_plain, (d_smooth, d_plain)
    # and it should be a REAL improvement, not noise
    assert d_smooth < 0.8 * d_plain, (d_smooth, d_plain)


def test_smoothed_quantized_runs_in_quantdense():
    """quantize_llm_int4_smooth output loads into the bits=4 model."""
    cfg = LlamaConfig.tiny()
    model, params = _structured_params(cfg, seed=5)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(5, cfg.vocab_size - 1,
                                          size=(1, 10)), jnp.int32
    )
    q = quantize_llm_int4_smooth(model, params, ids)
    qmodel = LlamaForCausalLM(LlamaConfig.tiny(quantize=True,
                                               quantize_bits=4,
                                               quantize_lm_head=False))
    out = qmodel.apply({"params": q}, ids)[0]
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_smoothing_exact_fold_on_fused_tree():
    """The qkv_proj / gate_up_proj branches: smoothing a FUSED float tree
    is also an exact fold (model outputs unchanged)."""
    from rlaifv_tpu.models.convert import fuse_llm_projections

    cfg = LlamaConfig.tiny()
    model, params = _structured_params(cfg, seed=2)
    ids = jnp.asarray(
        np.random.default_rng(6).integers(5, cfg.vocab_size - 1,
                                          size=(1, 10)), jnp.int32
    )
    stats = collect_llm_act_amax(model, params, ids)

    fused = fuse_llm_projections(jax.tree.map(np.asarray, params))
    fcfg = LlamaConfig.tiny(fuse_proj=True)
    fmodel = LlamaForCausalLM(fcfg)
    want = fmodel.apply({"params": fused}, ids)[0]
    smoothed = smooth_llm_for_int4(fused, stats, alpha=0.5)
    got = fmodel.apply({"params": smoothed}, ids)[0]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )

    # ... and the two orders agree exactly: smooth-then-fuse == fuse-then-
    # smooth (the folds act on the same rows/columns either way)
    a = fuse_llm_projections(smooth_llm_for_int4(
        jax.tree.map(np.asarray, params), stats, alpha=0.5))
    for la, lb in (("layer_0", "layer_0"), ("layer_1", "layer_1")):
        np.testing.assert_allclose(
            a["model"][la]["attn"]["qkv_proj"]["kernel"],
            smoothed["model"][lb]["attn"]["qkv_proj"]["kernel"],
            rtol=1e-6, atol=1e-6,
        )


def test_alpha_search_never_hurts_on_calibration():
    """The grid search includes alpha=0 (s=1, plain quantization), so the
    searched smoothing's calibration-batch quantization MSE is <= plain's
    for EVERY producer group — the AWQ guarantee the fixed exponent
    lacks."""
    from rlaifv_tpu.models.quant_smooth import (
        _act_quant,
        _quant_dequant,
        _search_scale,
        collect_llm_act_stats,
    )

    cfg = LlamaConfig.tiny()
    model, params = _structured_params(cfg, seed=9)
    ids = jnp.asarray(
        np.random.default_rng(13).integers(5, cfg.vocab_size - 1,
                                           size=(2, 16)), jnp.int32
    )
    stats = collect_llm_act_stats(model, params, ids)
    for lname, rec in stats.items():
        attn = params["model"][lname]["attn"]
        x = rec["attn_in"]
        kernels = [np.asarray(attn[m]["kernel"])
                   for m in ("q_proj", "k_proj", "v_proj")]
        s = _search_scale(x, kernels, None)

        def err(sv):  # the search's own objective: weight AND act quant
            total = 0.0
            xs = _act_quant(x / sv[None, :])
            for w in kernels:
                ref = x @ w
                got = xs @ _quant_dequant(w * sv[:, None])
                total += float(((got - ref) ** 2).mean())
            return total

        assert err(s) <= err(np.ones_like(s)) + 1e-12
