"""int4 fused decode kernel vs the per-layer flax decode path.

Same harness as test_fused_decode.py, but the weights are nibble-packed
int4 (int8 bytes, two logical rows each) with group scales
(convert.quantize_llm_int4 -> fuse_llm_projections). On
CPU the flax QuantDense(bits=4) fallback is the exact dequant matmul while
the kernel (interpret mode) quantizes activations, so parity carries the
same reassociation tolerance as the int8 tests. Geometry notes: tiny dims
make g_d=64 (one group) / g_o=32 (2 heads per o-group) / g_down=128 —
exercising multi-head o-groups and single-group contractions in one
config.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rlaifv_tpu.models.convert import (
    fuse_llm_projections,
    quantize_llm_int4,
)
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


def _setup(B=2, L=128, prompt_len=5, num_kv_heads=4):
    cfg = LlamaConfig.tiny(quantize=True, quantize_bits=4,
                           quantize_lm_head=False, fuse_proj=True,
                           kv_cache_dtype="int8", num_kv_heads=num_kv_heads)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(1, 200, size=(B, prompt_len)),
        jnp.int32,
    )
    fmodel = LlamaForCausalLM(
        LlamaConfig.tiny(num_kv_heads=num_kv_heads)
    )
    fparams = fmodel.init(jax.random.PRNGKey(0), ids)["params"]
    params = jax.tree.map(
        jnp.asarray, fuse_llm_projections(quantize_llm_int4(fparams))
    )
    model = LlamaForCausalLM(cfg)

    cache = llama_init_cache(cfg, B, L)
    mask = jnp.zeros((B, L), jnp.int32).at[:, :prompt_len].set(1)
    logits, cache = model.apply(
        {"params": params}, ids,
        attention_mask=mask, cache=cache, cache_index=jnp.int32(0),
    )
    tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
    return cfg, model, params, cache, mask, tok, prompt_len


@pytest.mark.slow
def test_int4_dims_and_stacked_layout():
    cfg, model, params, cache, mask, tok, t = _setup()
    L = mask.shape[1]
    dims = default_dims(cfg, L)
    assert dims.w4
    assert dims.g_o % dims.Dh == 0
    stacked = stack_llama_params(params, cfg)
    D, H, Dh = dims.D, dims.H, dims.Dh
    assert stacked["wqkv"].dtype == jnp.int8  # nibble-packed rows
    assert stacked["wqkv"].shape[1] == D // 2
    assert stacked["sqkv"].shape[1] == D // dims.g_d
    assert stacked["wo"].shape[1] == H * Dh // 2
    assert stacked["so"].shape[1] == H * Dh // dims.g_o
    assert stacked["wgu"].shape == (cfg.num_layers, D // 2, 2 * dims.Ip)
    assert stacked["wdown"].shape == (cfg.num_layers, dims.Ip // 2, D)
    assert stacked["sdown"].shape[1] == dims.Ip // dims.g_down


def test_fused_decode_int4_matches_flax():
    cfg, model, params, cache, mask, tok, t = _setup()
    B, L = mask.shape

    mask_t = mask.at[:, t].set(1)
    pos = jnp.full((B, 1), t, jnp.int32)
    want_logits, want_cache = model.apply(
        {"params": params}, tok[:, None],
        attention_mask=mask_t, position_ids=pos,
        cache=cache, cache_index=jnp.int32(t),
    )

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
    np.testing.assert_array_equal(
        np.argmax(np.asarray(got_logits[:, 0]), -1),
        np.argmax(np.asarray(want_logits[:, 0]), -1),
    )
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
def test_fused_decode_int4_multi_step_logits():
    """Three consecutive fused steps track the flax logits (the flax token
    feeds BOTH paths each step so the trajectories stay aligned; strict
    greedy-token equality is flaky on a tiny random model whose top-2 gap
    can be 1e-4 while the activation-quantization noise is ~3e-3 — the
    real-token parity gate is test_fused_decode_engine_int4_matches_per_
    layer, where both paths quantize identically)."""
    cfg, model, params, cache, mask, tok, t = _setup()
    B, L = mask.shape
    dims = default_dims(cfg, L)
    stacked = stack_llama_params(params, cfg)
    scache = stack_cache(cache)

    flax_cache = cache
    flax_mask = mask
    fused_mask = mask
    ftok = tok
    for step in range(3):
        pos_col = t + step
        flax_mask = flax_mask.at[:, pos_col].set(1)
        logits, flax_cache = model.apply(
            {"params": params}, ftok[:, None],
            attention_mask=flax_mask,
            position_ids=jnp.full((B, 1), pos_col, jnp.int32),
            cache=flax_cache, cache_index=jnp.int32(pos_col),
        )

        x = model.apply({"params": params}, ftok[:, None],
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
        np.testing.assert_allclose(
            np.asarray(lg[:, 0], np.float32),
            np.asarray(logits[:, -1], np.float32),
            rtol=2e-2, atol=2e-2, err_msg=f"step {step}",
        )
        ftok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)


@pytest.mark.slow
def test_fused_decode_int4_gqa():
    """GQA (4 q heads / 2 kv heads) + int4 weights."""
    cfg, model, params, cache, mask, tok, t = _setup(num_kv_heads=2)
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
    np.testing.assert_array_equal(
        np.argmax(np.asarray(got_logits[:, 0]), -1),
        np.argmax(np.asarray(want_logits[:, 0]), -1),
    )


def test_stacked_prefill_tower_int4():
    """The shared prefill tower consumes the int4 stacked layout and
    reproduces the flax prefill (same cache, same final hidden)."""
    from rlaifv_tpu.ops.fused_decode import (
        init_stacked_cache,
        stacked_prefill_tower,
    )

    cfg, model, params, cache, mask, tok, t = _setup()
    B, L = mask.shape
    ids = jnp.asarray(
        np.random.default_rng(0).integers(1, 200, size=(B, t)), jnp.int32
    )
    dims = default_dims(cfg, L)
    stacked = stack_llama_params(params, cfg)
    scache = init_stacked_cache(cfg, B, L)
    embeds = model.apply({"params": params}, ids, method=model.embed)
    win_mask = jnp.ones((B, t), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(t)[None], (B, t))
    hidden, scache = stacked_prefill_tower(
        stacked, scache, embeds, win_mask, pos, cfg, jnp.int32(0)
    )
    got = unstack_cache(scache)
    for i in range(cfg.num_layers):
        np.testing.assert_allclose(
            np.asarray(got[i]["k"][:, :t], np.int32),
            np.asarray(cache[i]["k"][:, :t], np.int32),
            atol=1,
        )
