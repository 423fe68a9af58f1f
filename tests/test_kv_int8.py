"""int8 KV cache: kernel parity and model-level semantics.

Prefill with an int8 cache attends over the fresh float k/v, so prefill
logits must be bit-identical to the fp-cache model; decode steps read the
quantized cache (per-token/head symmetric int8) and carry only the
quantization error."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from rlaifv_tpu.models.llama import LlamaConfig, LlamaForCausalLM
from rlaifv_tpu.ops.decode_attention import (
    decode_attention_prefix_int8,
    dequantize_kv,
    quantize_kv,
)


def test_prefix_int8_kernel_parity_interpret():
    rng = np.random.default_rng(0)
    B, L, H, KVH, D = 2, 256, 8, 4, 128
    q = jnp.asarray(rng.normal(size=(B, H, D)), jnp.float32)
    kf = jnp.asarray(rng.normal(size=(B, L, KVH, D)), jnp.float32)
    vf = jnp.asarray(rng.normal(size=(B, L, KVH, D)), jnp.float32)
    kq, ks = quantize_kv(kf)
    vq, vs = quantize_kv(vf)
    mask = np.ones((B, L), np.int32)
    mask[0, 200:] = 0
    mask = jnp.asarray(mask)

    got = decode_attention_prefix_int8(
        q, kq, ks, vq, vs, mask, jnp.int32(L), interpret=True
    )
    # the kernel additionally quantizes q and the (v-scaled) probability
    # rows to ride the MXU int8 path — ~1% relative error vs the
    # dequantized-dense oracle
    # oracle: dense attention over the dequantized cache (same fp32 math)
    from rlaifv_tpu.ops.attention import _build_bias, dense_attention, repeat_kv

    kd = dequantize_kv(kq, ks, jnp.float32)
    vd = dequantize_kv(vq, vs, jnp.float32)
    bias = _build_bias(1, L, mask, False, None, B)
    want = dense_attention(
        q[:, None], repeat_kv(kd, H // KVH), repeat_kv(vd, H // KVH), bias
    )[:, 0]
    denom = np.abs(np.asarray(want)).max()
    rel = np.abs(np.asarray(got) - np.asarray(want)).max() / denom
    assert rel < 0.035, f"kernel drift {rel:.4f}"


def test_quantize_roundtrip():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 16, 4, 32)) * 3, jnp.float32)
    q, s = quantize_kv(x)
    back = dequantize_kv(q, s, jnp.float32)
    # symmetric per-row int8: worst-case error is scale/2 = amax/254
    amax = np.abs(np.asarray(x)).max(axis=-1, keepdims=True)
    assert (np.abs(np.asarray(back) - np.asarray(x)) <= amax / 254 + 1e-6).all()


def _run_with_cache(model, params, ids, max_len):
    B, Lp = ids.shape
    cache = model.init_cache(B, max_len)
    mask = jnp.zeros((B, max_len), jnp.int32).at[:, :Lp].set(1)
    pos = jnp.broadcast_to(jnp.arange(Lp), (B, Lp))
    logits, cache = model.apply(
        {"params": params}, ids, attention_mask=mask,
        position_ids=pos, cache=cache, cache_index=jnp.int32(0),
    )
    # one decode step
    tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
    mask = mask.at[:, Lp].set(1)
    step_logits, _ = model.apply(
        {"params": params}, tok, attention_mask=mask,
        position_ids=jnp.full((B, 1), Lp),
        cache=cache, cache_index=jnp.int32(Lp),
    )
    return logits, step_logits


@pytest.mark.slow
def test_model_prefill_exact_decode_close():
    cfg_fp = LlamaConfig.tiny()
    cfg_q = dataclasses_replace(cfg_fp, kv_cache_dtype="int8")
    ids = jnp.asarray([[1, 7, 23, 5, 9, 2, 4, 11]], jnp.int32)
    model_fp = LlamaForCausalLM(cfg_fp)
    model_q = LlamaForCausalLM(cfg_q)
    params = model_fp.init(jax.random.PRNGKey(0), ids)["params"]

    lf, sf = _run_with_cache(model_fp, params, ids, max_len=16)
    lq, sq = _run_with_cache(model_q, params, ids, max_len=16)

    # prefill: fresh-k/v attention == cache attention, exactly
    np.testing.assert_allclose(np.asarray(lq), np.asarray(lf),
                               rtol=1e-5, atol=1e-5)
    # decode step: int8 cache reads carry quantization error only
    denom = np.abs(np.asarray(sf)).max() + 1e-6
    rel = np.abs(np.asarray(sq) - np.asarray(sf)).max() / denom
    assert rel < 0.05, f"decode drift {rel:.4f}"


def dataclasses_replace(cfg, **kw):
    import dataclasses

    return dataclasses.replace(cfg, **kw)
