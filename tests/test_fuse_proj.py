"""fuse_proj (qkv / gate_up fused projections, the serving call-count
optimization): the fused model on convert.fuse_llm_projections-rewritten
params must reproduce the unfused model exactly — for both float kernels
and the int8 {kernel, scale} layout (per-out-channel scales concat)."""
import jax
import jax.numpy as jnp
import numpy as np

from rlaifv_tpu.models.convert import fuse_llm_projections
from rlaifv_tpu.models.llama import LlamaConfig, LlamaForCausalLM


def _filled_params(model, ids, quantized):
    params = model.init(jax.random.PRNGKey(0), ids)["params"]
    if not quantized:
        return params
    rng = np.random.default_rng(3)

    def fill(p):
        out = {}
        for k, v in p.items():
            if isinstance(v, dict):
                out[k] = fill(v)
            elif v.dtype == jnp.int8:
                out[k] = jnp.asarray(rng.integers(-50, 50, size=v.shape),
                                     jnp.int8)
            elif k == "scale":
                out[k] = v * 0.02
            else:
                out[k] = v
        return out

    return fill(params)


def _check(quantized):
    base_cfg = LlamaConfig.tiny(quantize=quantized, quantize_lm_head=False)
    fused_cfg = LlamaConfig.tiny(quantize=quantized, quantize_lm_head=False,
                                 fuse_proj=True)
    ids = jnp.asarray([[1, 7, 23, 5, 9, 2, 4, 11]], jnp.int32)

    base = LlamaForCausalLM(base_cfg)
    params = _filled_params(base, ids, quantized)
    want = base.apply({"params": params}, ids)[0]

    fused_params = fuse_llm_projections(params)
    fused = LlamaForCausalLM(fused_cfg)
    # structural check: the fused tree matches what the fused module expects
    expect = jax.tree_util.tree_structure(
        fused.init(jax.random.PRNGKey(0), ids)["params"]
    )
    got_struct = jax.tree_util.tree_structure(
        jax.tree.map(jnp.asarray, fused_params)
    )
    assert expect == got_struct, f"\n{expect}\nvs\n{got_struct}"

    got = fused.apply({"params": jax.tree.map(jnp.asarray, fused_params)},
                      ids)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fuse_proj_float_parity():
    _check(quantized=False)


def test_fuse_proj_int8_parity():
    # int8 path: identical dynamic activation quantization on both sides,
    # so fused must be exact (scales concat per out channel)
    _check(quantized=True)
