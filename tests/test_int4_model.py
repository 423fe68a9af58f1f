"""QuantDense(bits=4) model integration: param layout, forward parity,
QLoRA-over-int4, and converter/fusion invariants.

On CPU the int4 path is the exact dequant matmul (`_jnp_fallback`), so
forward parity against a float model holding the dequantized weights is
elementwise-tight — the quantization error itself is covered by
tests/test_int4_matmul.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlaifv_tpu.models.llama import LlamaConfig, LlamaForCausalLM
from rlaifv_tpu.models.convert import (
    fuse_llm_projections,
    quantize_llm_int4,
)
from rlaifv_tpu.ops.int4_matmul import dequantize_int4, pick_int4_group


def _float_params(model, ids):
    return model.init(jax.random.PRNGKey(0), ids)["params"]


def _dequant_tree(qtree, ftree):
    """Replace float kernels with the int4 dequantized ones (where the
    quantizer produced a packed layout), leaving everything else alone."""
    out = {}
    for k, v in ftree.items():
        q = qtree[k]
        if isinstance(v, dict):
            if set(q) == {"kernel", "scale"} and np.asarray(
                q["scale"]
            ).ndim == 2:
                out[k] = {
                    "kernel": dequantize_int4(
                        jnp.asarray(q["kernel"]), jnp.asarray(q["scale"])
                    )
                }
            else:
                out[k] = _dequant_tree(q, v)
        else:
            out[k] = v
    return out


@pytest.mark.slow
def test_int4_param_layout_and_forward_parity():
    cfg = LlamaConfig.tiny()
    ids = jnp.asarray([[1, 5, 9, 12, 3]], jnp.int32)

    fmodel = LlamaForCausalLM(cfg)
    fparams = _float_params(fmodel, ids)
    qllm = quantize_llm_int4(fparams)

    # layout: nibble-packed int8 kernels + group scales (tiny dims -> one
    # group)
    qp = qllm["model"]["layer_0"]["attn"]["q_proj"]
    K = cfg.hidden_size
    G = pick_int4_group(K)
    assert qp["kernel"].shape == (K // 2, cfg.num_heads * cfg.head_size)
    assert qp["kernel"].dtype == np.int8
    assert qp["scale"].shape == (K // G, cfg.num_heads * cfg.head_size)
    # head stays float by default (include_lm_head=False)
    assert qllm["lm_head"]["kernel"].dtype == np.float32

    qmodel = LlamaForCausalLM(
        LlamaConfig.tiny(quantize=True, quantize_bits=4,
                         quantize_lm_head=False)
    )
    got = qmodel.apply({"params": qllm}, ids)[0]
    want = fmodel.apply({"params": _dequant_tree(qllm, fparams)}, ids)[0]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


@pytest.mark.slow
def test_int4_lora_bites_and_grads_flow():
    """True-QLoRA: bf16 adapters over the frozen packed-int4 base; grads
    reach the adapters through the int4 dx path (exact fallback on CPU)."""
    from rlaifv_tpu.train.lora import lora_init, lora_scaled

    cfg = LlamaConfig.tiny(quantize=True, quantize_bits=4,
                           quantize_lm_head=False)
    model = LlamaForCausalLM(cfg)
    ids = jnp.asarray([[1, 5, 9, 12]], jnp.int32)
    fparams = _float_params(LlamaForCausalLM(LlamaConfig.tiny()), ids)
    params = quantize_llm_int4(fparams)

    lora = lora_init(jax.random.PRNGKey(1), params, r=2,
                     target=r"model/.*(q_proj|up_proj)/kernel$")
    assert jax.tree_util.tree_leaves(lora), "no targets matched"
    lora = jax.tree.map(lambda x: x + 0.05, lora)

    base = model.apply({"params": params}, ids)[0]
    with_lora = model.apply(
        {"params": params, "lora": lora_scaled(lora, alpha=16.0)}, ids
    )[0]
    assert float(jnp.abs(base - with_lora).max()) > 1e-4

    def loss(lora):
        out = model.apply(
            {"params": params, "lora": lora_scaled(lora, alpha=16.0)}, ids
        )[0]
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(lora)
    norms = [float(jnp.abs(x).max()) for x in jax.tree_util.tree_leaves(g)]
    assert all(np.isfinite(norms)) and max(norms) > 0


def test_int4_fuse_quantize_commute():
    """fuse(quantize(w)) == quantize(fuse(w)): group scales are per
    (K-group, out-column), so the N-axis concat never mixes groups."""
    rng = np.random.default_rng(0)
    layer = {"attn": {
        "q_proj": {"kernel": rng.standard_normal((64, 32)).astype(np.float32)},
        "k_proj": {"kernel": rng.standard_normal((64, 16)).astype(np.float32)},
        "v_proj": {"kernel": rng.standard_normal((64, 16)).astype(np.float32)},
    }}
    a = fuse_llm_projections(quantize_llm_int4(layer))
    b = quantize_llm_int4(fuse_llm_projections(layer))
    # quantize_llm_int4 only matches q/k/v_proj module names; after fusion
    # the module is qkv_proj, which the walker skips — quantize first is
    # the supported order. Verify that order produced the packed layout:
    qkv = a["attn"]["qkv_proj"]  # tiny K=64 -> one group (G = K)
    assert qkv["kernel"].shape == (32, 64) and qkv["scale"].shape == (1, 64)
    # ... and the fused dequant equals per-part dequant concatenated
    parts = quantize_llm_int4(layer)["attn"]
    want = np.concatenate(
        [
            np.asarray(dequantize_int4(jnp.asarray(parts[n]["kernel"]),
                                       jnp.asarray(parts[n]["scale"])))
            for n in ("q_proj", "k_proj", "v_proj")
        ],
        axis=1,
    )
    got = np.asarray(dequantize_int4(jnp.asarray(qkv["kernel"]),
                                     jnp.asarray(qkv["scale"])))
    np.testing.assert_allclose(got, want, rtol=0, atol=0)
    del b  # quantize-after-fuse intentionally leaves qkv_proj float


@pytest.mark.slow
def test_vision_int4_forward():
    """EVA02 tower with QuantDense(bits=4): quantize_vision_int4 params
    apply cleanly and match the dequantized float tower (exact on CPU)."""
    from rlaifv_tpu.models.convert import quantize_vision_int4
    from rlaifv_tpu.models.eva02 import EvaVisionTower, EvaConfig

    cfg = EvaConfig.tiny()
    model = EvaVisionTower(cfg)
    img = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 28, 28, 3)), jnp.float32
    )
    fparams = model.init(jax.random.PRNGKey(0), img)["params"]
    qparams = quantize_vision_int4(fparams)
    qmodel = EvaVisionTower(EvaConfig.tiny(quantize=True, quantize_bits=4))
    got = qmodel.apply({"params": qparams}, img)

    # dequantize the int4 modules back into the float tree
    def walk(q, f):
        out = {}
        for k, v in f.items():
            qq = q[k]
            if isinstance(v, dict):
                if (
                    isinstance(qq, dict)
                    and "scale" in qq
                    and np.asarray(qq.get("scale")).ndim == 2
                ):
                    out[k] = dict(
                        qq,
                        kernel=dequantize_int4(
                            jnp.asarray(qq["kernel"]),
                            jnp.asarray(qq["scale"]),
                        ),
                    )
                    out[k].pop("scale")
                else:
                    out[k] = walk(qq, v)
            else:
                out[k] = v
        return out

    want = model.apply({"params": walk(qparams, fparams)}, img)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_fused_proj_int4_model_forward():
    """fuse_proj + int4: the fused qkv/gate_up matmuls run through the
    packed layout end-to-end."""
    cfg = LlamaConfig.tiny(quantize=True, quantize_bits=4,
                           quantize_lm_head=False, fuse_proj=True)
    ids = jnp.asarray([[2, 7, 11]], jnp.int32)
    fmodel = LlamaForCausalLM(LlamaConfig.tiny())
    fparams = _float_params(fmodel, ids)
    qllm = fuse_llm_projections(quantize_llm_int4(fparams))
    got = LlamaForCausalLM(cfg).apply({"params": qllm}, ids)[0]
    want = fmodel.apply(
        {"params": _dequant_tree(quantize_llm_int4(fparams), fparams)}, ids
    )[0]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )
