"""Multi-layer fused decode kernel vs the per-layer flax decode path.

Both run the SAME int8 weights (quantize + fuse_proj) and int8 KV cache;
the kernel (interpret mode on CPU) must reproduce the layer-stack decode
step up to activation-quantization reassociation noise.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rlaifv_tpu.models.convert import fuse_llm_projections
from rlaifv_tpu.models.llama import (
    LlamaConfig,
    LlamaForCausalLM,
    llama_init_cache,
)
from rlaifv_tpu.ops.fused_decode import (
    default_dims,
    fused_decode_step,
    scatter_new_kv,
    stack_cache,
    stack_llama_params,
    unstack_cache,
)


def _setup(B=2, L=128, prompt_len=5):
    # MHA geometry (vicuna-7B shape); GQA covered by
    # test_fused_decode_gqa_matches_flax
    cfg = LlamaConfig.tiny(quantize=True, quantize_lm_head=False,
                           fuse_proj=True, kv_cache_dtype="int8",
                           num_kv_heads=4)
    base_cfg = LlamaConfig.tiny(quantize=True, quantize_lm_head=False,
                                kv_cache_dtype="int8", num_kv_heads=4)
    return _setup_from(cfg, base_cfg, B=B, L=L, prompt_len=prompt_len)


def _setup_from(cfg, base_cfg, B=2, L=128, prompt_len=5):
    ids = jnp.asarray(
        np.random.default_rng(0).integers(1, 200, size=(B, prompt_len)),
        jnp.int32,
    )
    base = LlamaForCausalLM(base_cfg)
    params = base.init(jax.random.PRNGKey(0), ids)["params"]
    rng = np.random.default_rng(3)

    def fill(p):
        out = {}
        for k, v in p.items():
            if isinstance(v, dict):
                out[k] = fill(v)
            elif v.dtype == jnp.int8:
                out[k] = jnp.asarray(
                    rng.integers(-50, 50, size=v.shape), jnp.int8
                )
            elif k == "scale" and v.ndim == 1 and "ln" not in str(k):
                out[k] = v * 0.02
            else:
                out[k] = v
        return out

    params = fill(params)
    # give the norms non-trivial scales too
    params = jax.tree_util.tree_map(jnp.asarray, params)
    fused_params = jax.tree.map(jnp.asarray, fuse_llm_projections(params))
    model = LlamaForCausalLM(cfg)

    # prefill through the flax path to populate the cache
    cache = llama_init_cache(cfg, B, L)
    mask = jnp.zeros((B, L), jnp.int32).at[:, :prompt_len].set(1)
    logits, cache = model.apply(
        {"params": fused_params}, ids,
        attention_mask=mask, cache=cache, cache_index=jnp.int32(0),
    )
    tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
    return cfg, model, fused_params, cache, mask, tok, prompt_len


@pytest.mark.slow
def test_fused_decode_matches_flax():
    cfg, model, params, cache, mask, tok, t = _setup()
    B, L = mask.shape

    # --- reference: flax per-layer decode step
    mask_t = mask.at[:, t].set(1)
    pos = jnp.full((B, 1), t, jnp.int32)
    want_logits, want_cache = model.apply(
        {"params": params}, tok[:, None],
        attention_mask=mask_t, position_ids=pos,
        cache=cache, cache_index=jnp.int32(t),
    )

    # --- fused kernel step
    dims = default_dims(cfg, L)
    stacked = stack_llama_params(params, cfg)
    scache = stack_cache(cache)
    x = model.apply({"params": params}, tok[:, None], method=model.embed)[:, 0]
    x_out, new_kv = fused_decode_step(
        stacked, scache, x, mask, jnp.full((B,), t, jnp.int32),
        jnp.int32(t), dims, rope_theta=cfg.rope_theta, interpret=True,
    )
    scache2 = scatter_new_kv(scache, new_kv, jnp.int32(t))

    normed = model.apply(
        {"params": params}, x_out[:, None].astype(cfg.dtype),
        method=lambda m, h: m.model.ln_f(h),
    )
    got_logits = model.apply(
        {"params": params}, normed, method=lambda m, h: m.logits(h)
    )

    np.testing.assert_allclose(
        np.asarray(got_logits[:, 0], np.float32),
        np.asarray(want_logits[:, 0], np.float32),
        rtol=2e-2, atol=2e-2,
    )
    # top-1 agreement (what decode actually consumes)
    np.testing.assert_array_equal(
        np.argmax(np.asarray(got_logits[:, 0]), -1),
        np.argmax(np.asarray(want_logits[:, 0]), -1),
    )

    # cache writes match the flax update. On CPU the flax QuantDense
    # fallback skips activation quantization (the kernel always
    # quantizes), so a couple of int8 LSBs of drift is expected; on TPU
    # both paths run the same int8 math (run_tpu_checks greedy parity).
    got_cache = unstack_cache(scache2)
    for i in range(cfg.num_layers):
        for key in ("k", "v"):
            np.testing.assert_allclose(
                np.asarray(got_cache[i][key][:, t], np.int32),
                np.asarray(want_cache[i][key][:, t], np.int32),
                atol=3,
            )
            np.testing.assert_allclose(
                np.asarray(got_cache[i][f"{key}_scale"][:, t]),
                np.asarray(want_cache[i][f"{key}_scale"][:, t]),
                rtol=5e-2,
            )


@pytest.mark.slow
def test_fused_decode_multi_step_greedy():
    """Three consecutive fused steps reproduce the flax greedy tokens."""
    cfg, model, params, cache, mask, tok, t = _setup()
    B, L = mask.shape
    dims = default_dims(cfg, L)
    stacked = stack_llama_params(params, cfg)
    scache = stack_cache(cache)

    flax_cache = cache
    flax_mask = mask
    fused_mask = mask
    ftok, xtok = tok, tok
    for step in range(3):
        pos_col = t + step
        flax_mask = flax_mask.at[:, pos_col].set(1)
        logits, flax_cache = model.apply(
            {"params": params}, ftok[:, None],
            attention_mask=flax_mask,
            position_ids=jnp.full((B, 1), pos_col, jnp.int32),
            cache=flax_cache, cache_index=jnp.int32(pos_col),
        )
        ftok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)

        x = model.apply({"params": params}, xtok[:, None],
                        method=model.embed)[:, 0]
        x_out, new_kv = fused_decode_step(
            stacked, scache, x, fused_mask,
            jnp.full((B,), pos_col, jnp.int32), jnp.int32(pos_col),
            dims, rope_theta=cfg.rope_theta, interpret=True,
        )
        scache = scatter_new_kv(scache, new_kv, jnp.int32(pos_col))
        fused_mask = fused_mask.at[:, pos_col].set(1)
        normed = model.apply(
            {"params": params}, x_out[:, None].astype(cfg.dtype),
            method=lambda m, h: m.model.ln_f(h),
        )
        lg = model.apply({"params": params}, normed,
                         method=lambda m, h: m.logits(h))
        xtok = jnp.argmax(lg[:, 0], -1).astype(jnp.int32)
        np.testing.assert_array_equal(np.asarray(xtok), np.asarray(ftok),
                                      err_msg=f"step {step}")


def test_pick_intermediate_lane_legal():
    """Chosen MLP blocks are Mosaic lane-legal; vicuna-7B pads 11008 to
    11264 = 8 x 1408 (the bug the real-TPU bench caught: bi=1376 is not
    a 128-multiple)."""
    from rlaifv_tpu.ops.fused_decode import _pick_intermediate

    for I in (128, 512, 11008, 11264, 14336, 13824, 8192, 384):
        Ip, bi = _pick_intermediate(I)
        assert Ip >= I and Ip % 128 == 0 and Ip % bi == 0 and bi % 128 == 0
    assert _pick_intermediate(11008) == (11264, 1408)
    assert _pick_intermediate(128) == (128, 128)


@pytest.mark.slow
def test_fused_decode_padded_intermediate():
    """I=96 pads to Ip=128: padded columns must contribute exactly zero
    (parity vs the flax path at the true intermediate size)."""
    cfg, model, params, cache, mask, tok, t = _setup_I(96)
    B, L = mask.shape
    mask_t = mask.at[:, t].set(1)
    want_logits, _ = model.apply(
        {"params": params}, tok[:, None],
        attention_mask=mask_t,
        position_ids=jnp.full((B, 1), t, jnp.int32),
        cache=cache, cache_index=jnp.int32(t),
    )
    dims = default_dims(cfg, L)
    assert dims.Ip > dims.I  # padding actually exercised
    stacked = stack_llama_params(params, cfg)
    assert stacked["wgu"].shape[-1] == 2 * dims.Ip
    scache = stack_cache(cache)
    x = model.apply({"params": params}, tok[:, None], method=model.embed)[:, 0]
    x_out, _ = fused_decode_step(
        stacked, scache, x, mask, jnp.full((B,), t, jnp.int32),
        jnp.int32(t), dims, rope_theta=cfg.rope_theta, interpret=True,
    )
    normed = model.apply(
        {"params": params}, x_out[:, None].astype(cfg.dtype),
        method=lambda m, h: m.model.ln_f(h),
    )
    got_logits = model.apply({"params": params}, normed,
                             method=lambda m, h: m.logits(h))
    np.testing.assert_allclose(
        np.asarray(got_logits[:, 0], np.float32),
        np.asarray(want_logits[:, 0], np.float32),
        rtol=2e-2, atol=2e-2,
    )


def _setup_I(intermediate):
    cfg = LlamaConfig.tiny(quantize=True, quantize_lm_head=False,
                           fuse_proj=True, kv_cache_dtype="int8",
                           num_kv_heads=4, intermediate_size=intermediate)
    base_cfg = LlamaConfig.tiny(quantize=True, quantize_lm_head=False,
                                kv_cache_dtype="int8", num_kv_heads=4,
                                intermediate_size=intermediate)
    return _setup_from(cfg, base_cfg)


def test_fused_decode_gqa_matches_flax():
    """GQA (tiny default: 4 heads, 2 kv heads) through the (kv-head,
    batch, rep) attention ordering reproduces the per-layer flax step."""
    cfg = LlamaConfig.tiny(quantize=True, quantize_lm_head=False,
                           fuse_proj=True, kv_cache_dtype="int8")
    base_cfg = LlamaConfig.tiny(quantize=True, quantize_lm_head=False,
                                kv_cache_dtype="int8")
    assert cfg.num_heads != cfg.num_kv_heads  # GQA actually exercised
    cfg, model, params, cache, mask, tok, t = _setup_from(cfg, base_cfg)
    B, L = mask.shape
    mask_t = mask.at[:, t].set(1)
    want_logits, _ = model.apply(
        {"params": params}, tok[:, None],
        attention_mask=mask_t,
        position_ids=jnp.full((B, 1), t, jnp.int32),
        cache=cache, cache_index=jnp.int32(t),
    )
    dims = default_dims(cfg, L)
    stacked = stack_llama_params(params, cfg)
    scache = stack_cache(cache)
    x = model.apply({"params": params}, tok[:, None], method=model.embed)[:, 0]
    x_out, _ = fused_decode_step(
        stacked, scache, x, mask, jnp.full((B,), t, jnp.int32),
        jnp.int32(t), dims, rope_theta=cfg.rope_theta, interpret=True,
    )
    normed = model.apply(
        {"params": params}, x_out[:, None].astype(cfg.dtype),
        method=lambda m, h: m.model.ln_f(h),
    )
    got_logits = model.apply({"params": params}, normed,
                             method=lambda m, h: m.logits(h))
    np.testing.assert_allclose(
        np.asarray(got_logits[:, 0], np.float32),
        np.asarray(want_logits[:, 0], np.float32),
        rtol=2e-2, atol=2e-2,
    )
    np.testing.assert_array_equal(
        np.argmax(np.asarray(got_logits[:, 0]), -1),
        np.argmax(np.asarray(want_logits[:, 0]), -1),
    )


def test_fused_decode_rejects_ragged_heads():
    from rlaifv_tpu.ops.fused_decode import default_dims as dd

    cfg = LlamaConfig.tiny(quantize=True, fuse_proj=True,
                           kv_cache_dtype="int8", num_heads=4,
                           num_kv_heads=3)
    dims = dd(cfg, 128)
    import jax.numpy as _jnp
    with pytest.raises(AssertionError, match="multiple"):
        from rlaifv_tpu.ops.fused_decode import fused_decode_step as f
        f({}, {}, _jnp.zeros((2, cfg.hidden_size)), _jnp.zeros((2, 128)),
          _jnp.zeros((2,), _jnp.int32), 0, dims)
