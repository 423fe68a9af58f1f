"""Run the TPU-only kernel checks on the real chip, crash-isolated.

tests/conftest.py pins pytest to the 8-device virtual CPU mesh, so Pallas
kernel tests skip there. This standalone runner executes the same checks
compiled on hardware:

    python tests/run_tpu_checks.py                # all sections
    python tests/run_tpu_checks.py --section X    # one section, in-process

Each section runs in its OWN subprocess (a backend crash or a hung axon
tunnel loses one section, not the record of everything that already
passed — round 4 lost a 12-section PASS record to one s4 `device_put`
crash), is retried once on failure (the first failure mode seen on this
runtime was a transient `UNIMPLEMENTED` backend error), and the runner
always prints a final machine-readable summary line and writes it to
TPU_CHECKS.json at the repo root.

Env knobs: TPU_CHECK_TIMEOUT_S per-section (default 900), TPU_CHECK_ONLY
comma-list to subset.
"""
import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.join(_HERE, "..")
sys.path.insert(0, _ROOT)


# --------------------------------------------------------------- sections


def _jax():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    assert jax.default_backend() == "tpu", (
        f"needs a TPU backend, got {jax.default_backend()}"
    )
    import jax.numpy as jnp

    return jax, jnp


def _attn_refs():
    from rlaifv_tpu.ops.attention import _build_bias, dense_attention, repeat_kv

    return _build_bias, dense_attention, repeat_kv


def check_flash():
    jax, jnp = _jax()
    _build_bias, dense_attention, repeat_kv = _attn_refs()
    from rlaifv_tpu.ops.flash_attention import flash_attention

    def ref(q, k, v, mask, causal=True):
        # HIGHEST: the fp32 default on this MXU is a single bf16 pass
        # (~1e-2 abs error at these shapes) — an inaccurate reference that
        # previously matched the kernel only because both made the same
        # rounding. The flash kernels pin HIGHEST for fp32 inputs, so the
        # reference must be exact to compare against.
        with jax.default_matmul_precision("highest"):
            n_rep = q.shape[2] // k.shape[2]
            bias = _build_bias(q.shape[1], k.shape[1], mask, causal, None,
                               q.shape[0])
            return dense_attention(q, repeat_kv(k, n_rep), repeat_kv(v, n_rep),
                                   bias)

    rng = np.random.default_rng(0)
    failures = 0
    for kvh in (8, 2):
        B, L, H, D = 2, 256, 8, 128
        q = jnp.asarray(rng.normal(size=(B, L, H, D)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, L, kvh, D)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, L, kvh, D)), jnp.float32)
        mask = np.ones((B, L), np.int32)
        mask[1, 200:] = 0
        mask = jnp.asarray(mask)

        out = flash_attention(q, k, v, attention_mask=mask)
        want = ref(q, k, v, mask)
        fwd = float(jnp.abs(out - want).max())
        ok_fwd = fwd < 1e-5

        g = jnp.asarray(rng.normal(size=(B, L, H, D)), jnp.float32)
        gf = jax.grad(
            lambda q, k, v: (flash_attention(q, k, v, attention_mask=mask) * g).sum(),
            argnums=(0, 1, 2),
        )(q, k, v)
        gd = jax.grad(
            lambda q, k, v: (ref(q, k, v, mask) * g).sum(), argnums=(0, 1, 2)
        )(q, k, v)
        grad_diffs = [float(jnp.abs(a - b).max()) for a, b in zip(gf, gd)]
        ok_grad = all(d < 1e-3 for d in grad_diffs)

        status = "OK" if (ok_fwd and ok_grad) else "FAIL"
        failures += not (ok_fwd and ok_grad)
        print(f"flash kvh={kvh}: fwd={fwd:.2e} grads={grad_diffs} [{status}]")
    return failures


def check_flash_rect():
    # rectangular shared-prefix shape: suffix queries (W) over prefix+suffix
    # keys (P+W), static q_offset=P (the paired DPO training path).
    # (2, 384, 256): aligned fast path; (2, 601, 423): the real-prompt
    # unaligned case riding the transparent-padding wrapper.
    jax, jnp = _jax()
    _build_bias, dense_attention, repeat_kv = _attn_refs()
    from rlaifv_tpu.ops.flash_attention import flash_attention

    rng = np.random.default_rng(0)
    failures = 0
    for B, P, W in ((2, 384, 256), (2, 601, 423)):
        kvh, H, D = 2, 8, 128
        Lk = P + W
        q = jnp.asarray(rng.normal(size=(B, W, H, D)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, Lk, kvh, D)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, Lk, kvh, D)), jnp.float32)
        mask = np.ones((B, Lk), np.int32)
        mask[1, Lk - 48:] = 0
        mask = jnp.asarray(mask)

        def rref(q, k, v):
            with jax.default_matmul_precision("highest"):
                n_rep = q.shape[2] // k.shape[2]
                bias = _build_bias(W, Lk, mask, True, P, B)
                return dense_attention(
                    q, repeat_kv(k, n_rep), repeat_kv(v, n_rep), bias
                )

        out = flash_attention(q, k, v, attention_mask=mask, q_offset=P)
        fwd = float(jnp.abs(out - rref(q, k, v)).max())
        ok_fwd = fwd < 1e-5
        g = jnp.asarray(rng.normal(size=out.shape), jnp.float32)
        gf = jax.grad(
            lambda q, k, v: (flash_attention(
                q, k, v, attention_mask=mask, q_offset=P) * g).sum(),
            argnums=(0, 1, 2),
        )(q, k, v)
        gd = jax.grad(
            lambda q, k, v: (rref(q, k, v) * g).sum(), argnums=(0, 1, 2)
        )(q, k, v)
        grad_diffs = [float(jnp.abs(a - b).max()) for a, b in zip(gf, gd)]
        ok_grad = all(d < 1e-3 for d in grad_diffs)
        status = "OK" if (ok_fwd and ok_grad) else "FAIL"
        failures += not (ok_fwd and ok_grad)
        print(f"flash rect P={P} W={W}: fwd={fwd:.2e} grads={grad_diffs} "
              f"[{status}]")
    return failures


def check_decode():
    jax, jnp = _jax()
    _build_bias, dense_attention, repeat_kv = _attn_refs()
    from rlaifv_tpu.ops.decode_attention import decode_attention

    rng = np.random.default_rng(0)
    failures = 0
    for kvh in (8, 4):
        B, L, H, D = 4, 896, 8, 128
        q = jnp.asarray(rng.normal(size=(B, H, D)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, L, kvh, D)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, L, kvh, D)), jnp.float32)
        mask = np.ones((B, L), np.int32)
        mask[0, 700:] = 0
        mask[2, 13:] = 0
        mask = jnp.asarray(mask)

        got = decode_attention(q, k, v, mask)
        bias = _build_bias(1, L, mask, False, None, B)
        want = dense_attention(
            q[:, None], repeat_kv(k, H // kvh), repeat_kv(v, H // kvh), bias
        )[:, 0]
        diff = float(jnp.abs(got - want).max())
        ok = diff < 2e-3
        failures += not ok
        print(f"decode kvh={kvh}: fwd={diff:.2e} [{'OK' if ok else 'FAIL'}]")
    return failures


def check_decode_int8():
    # int8 KV cache prefix kernel vs dense-over-dequantized oracle
    jax, jnp = _jax()
    _build_bias, dense_attention, repeat_kv = _attn_refs()
    from rlaifv_tpu.ops.decode_attention import (
        decode_attention_prefix_int8,
        dequantize_kv,
        quantize_kv,
    )

    rng = np.random.default_rng(0)
    failures = 0
    for kvh in (8, 4):
        B, L, H, D = 4, 896, 8, 128
        q = jnp.asarray(rng.normal(size=(B, H, D)), jnp.float32)
        kf = jnp.asarray(rng.normal(size=(B, L, kvh, D)), jnp.float32)
        vf = jnp.asarray(rng.normal(size=(B, L, kvh, D)), jnp.float32)
        kq, ks = quantize_kv(kf)
        vq, vs = quantize_kv(vf)
        mask = np.ones((B, L), np.int32)
        mask[:, 700:] = 0  # valid_len cut — kernel never reads past it
        mask[2, 13:] = 0
        mask = jnp.asarray(mask)

        got = decode_attention_prefix_int8(
            q, kq, ks, vq, vs, mask, jnp.int32(700)
        )
        kd = dequantize_kv(kq, ks, jnp.float32)
        vd = dequantize_kv(vq, vs, jnp.float32)
        bias = _build_bias(1, L, mask, False, None, B)
        want = dense_attention(
            q[:, None], repeat_kv(kd, H // kvh), repeat_kv(vd, H // kvh), bias
        )[:, 0]
        # kernel quantizes q and the v-scaled p rows (MXU int8 path):
        # ~1% relative vs the dequantized oracle
        rel = float(jnp.abs(got - want).max() / jnp.abs(want).max())
        ok = rel < 0.035
        failures += not ok
        print(f"decode int8 kvh={kvh}: rel={rel:.2e} "
              f"[{'OK' if ok else 'FAIL'}]")
    return failures


def check_fused_head():
    jax, jnp = _jax()
    from rlaifv_tpu.ops.fused_head import fused_target_logp, target_logp_xla

    rng = np.random.default_rng(0)
    failures = 0
    for dtype, tol_f, tol_g in ((jnp.float32, 3e-4, 2e-3),
                                (jnp.bfloat16, 6e-2, 8e-2)):
        M, H, V = 2048, 1024, 32000
        x = jnp.asarray(rng.normal(size=(M, H)) * 0.3, dtype)
        w = jnp.asarray(rng.normal(size=(H, V)) * 0.02, dtype)
        y = jnp.asarray(rng.integers(0, V, size=(M,)), jnp.int32)
        g = jnp.asarray(rng.normal(size=(M,)), jnp.float32)

        # f32 oracle at HIGHEST matmul precision (XLA's default f32 matmul
        # is bf16 passes on TPU — less accurate than the kernel, which pins
        # HIGHEST for f32 inputs)
        xf, wf = x.astype(jnp.float32), w.astype(jnp.float32)
        with jax.default_matmul_precision("highest"):
            want = target_logp_xla(xf, wf, y)
            dxx, dwx = jax.grad(
                lambda x, w: (target_logp_xla(x, w, y) * g).sum(),
                argnums=(0, 1),
            )(xf, wf)
        got = fused_target_logp(x, w, y)
        fwd = float(jnp.abs(got - want).max())
        ok_fwd = fwd < tol_f

        dxf, dwf = jax.grad(
            lambda x, w: (fused_target_logp(x, w, y) * g).sum(), argnums=(0, 1)
        )(x, w)
        gdiffs = [
            float(jnp.abs(a.astype(jnp.float32) - b).max())
            for a, b in zip((dxf, dwf), (dxx, dwx))
        ]
        ok_grad = all(d < tol_g for d in gdiffs)
        status = "OK" if (ok_fwd and ok_grad) else "FAIL"
        failures += not (ok_fwd and ok_grad)
        print(f"fused_head {jnp.dtype(dtype).name}: fwd={fwd:.2e} "
              f"grads={gdiffs} [{status}]")
    return failures


# hardware-legal tiny geometries (lane dims must be 128-multiples on the
# chip; the pytest tiny config's head_dim=16 only works in interpret):
# MHA (vicuna-7B shape) and GQA (llama3-8B shape, n_rep=2)
_FD_GEOMS = {
    "mha": dict(hidden_size=256, intermediate_size=512, num_heads=2,
                num_kv_heads=2, head_dim=128),
    "gqa": dict(hidden_size=512, intermediate_size=512, num_heads=4,
                num_kv_heads=2, head_dim=128),
}


def _check_fused_decode(label):
    # multi-layer fused decode step vs the flax per-layer path, both
    # COMPILED on the chip (same int8 math on both sides here, unlike the
    # CPU interpret-mode test where the flax fallback skips act quant)
    jax, jnp = _jax()
    sys.path.insert(0, _HERE)
    from test_fused_decode import _setup_from

    from rlaifv_tpu.models.llama import LlamaConfig
    from rlaifv_tpu.ops.fused_decode import (
        default_dims,
        fused_decode_step,
        scatter_new_kv,
        stack_cache,
        stack_llama_params,
    )

    hw = dict(quantize=True, quantize_lm_head=False,
              kv_cache_dtype="int8", **_FD_GEOMS[label])
    cfg, model, params, cache, mask, tok, t = _setup_from(
        LlamaConfig.tiny(fuse_proj=True, **hw), LlamaConfig.tiny(**hw)
    )
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
    x = model.apply({"params": params}, tok[:, None],
                    method=model.embed)[:, 0]
    x_out, new_kv = fused_decode_step(
        stacked, scache, x, mask, jnp.full((B,), t, jnp.int32),
        jnp.int32(t), dims, rope_theta=cfg.rope_theta,
    )
    scatter_new_kv(scache, new_kv, jnp.int32(t))  # exercises the scatter
    normed = model.apply(
        {"params": params}, x_out[:, None].astype(cfg.dtype),
        method=lambda m, h: m.model.ln_f(h),
    )
    got_logits = model.apply({"params": params}, normed,
                             method=lambda m, h: m.logits(h))
    diff = float(jnp.abs(got_logits[:, 0].astype(jnp.float32)
                         - want_logits[:, 0].astype(jnp.float32)).max())
    top_ok = bool(
        (jnp.argmax(got_logits[:, 0], -1)
         == jnp.argmax(want_logits[:, 0], -1)).all()
    )
    ok = diff < 2e-2 and top_ok
    print(f"fused_decode[{label}]: logits={diff:.2e} top1={top_ok} "
          f"[{'OK' if ok else 'FAIL'}]")
    return int(not ok)


def check_fused_decode_mha():
    return _check_fused_decode("mha")


def check_fused_decode_gqa():
    return _check_fused_decode("gqa")


def check_int4_matmul():
    # int4 (nibble-packed int8 + group scales) on hardware: standalone
    # matmul vs the integer-math oracle. These kernels unpack in VMEM via
    # i32 widen+shift (i8 shifts do not legalize; the s4 dtype cannot be
    # laid out for a Pallas operand on this runtime) — this is the
    # execution check.
    jax, jnp = _jax()
    from rlaifv_tpu.ops.int4_matmul import int4_matmul, quantize_int4, unpack_int4

    rng = np.random.default_rng(0)
    M, K, N = 16, 512, 384
    x = rng.standard_normal((M, K)).astype(np.float32)
    w = rng.standard_normal((K, N)).astype(np.float32)
    packed, gsc = quantize_int4(w, group=128)
    q = np.asarray(unpack_int4(jnp.asarray(packed), 128))

    def oracle_fwd(x, q, scale, group=128):
        sx = np.maximum(np.abs(x).max(axis=1, keepdims=True), 1e-20) / 127.0
        xq = np.clip(np.round(x / sx), -127, 127).astype(np.int32)
        qi = q.astype(np.int32)
        acc = np.zeros((x.shape[0], qi.shape[1]), np.float32)
        for gi in range(qi.shape[0] // group):
            sl = slice(gi * group, (gi + 1) * group)
            acc += (xq[:, sl] @ qi[sl]).astype(np.float32) * scale[gi][None, :]
        return acc * sx

    got4 = np.asarray(int4_matmul(jnp.asarray(x), jnp.asarray(packed),
                                  jnp.asarray(gsc), group=128), np.float32)
    want4 = oracle_fwd(x, q, gsc)
    d4 = float(np.abs(got4 - want4).max() / (np.abs(want4).max() + 1e-9))
    ok4 = d4 < 1e-4
    print(f"int4_matmul: rel={d4:.2e} [{'OK' if ok4 else 'FAIL'}]")
    return int(not ok4)


def check_int4_dx():
    jax, jnp = _jax()
    from rlaifv_tpu.ops.int4_matmul import (
        int4_matmul_dx,
        quantize_int4,
        unpack_int4,
    )

    rng = np.random.default_rng(0)
    M, K, N = 16, 512, 384
    w = rng.standard_normal((K, N)).astype(np.float32)
    packed, gsc = quantize_int4(w, group=128)
    q = np.asarray(unpack_int4(jnp.asarray(packed), 128))
    dy = rng.standard_normal((M, N)).astype(np.float32)

    def oracle_dx(dy, q, scale, group=128):
        qi = q.astype(np.int32)
        cols = []
        for gi in range(qi.shape[0] // group):
            dys = dy * scale[gi][None, :]
            sy = np.maximum(np.abs(dys).max(axis=1, keepdims=True),
                            1e-20) / 127.0
            dyq = np.clip(np.round(dys / sy), -127, 127).astype(np.int32)
            cols.append(
                (dyq @ qi[gi * group : (gi + 1) * group].T).astype(np.float32)
                * sy
            )
        return np.concatenate(cols, axis=1)

    gotdx = np.asarray(int4_matmul_dx(jnp.asarray(dy), jnp.asarray(packed),
                                      jnp.asarray(gsc), group=128),
                       np.float32)
    wantdx = oracle_dx(dy, q, gsc)
    ddx = float(np.abs(gotdx - wantdx).max() / (np.abs(wantdx).max() + 1e-9))
    okdx = ddx < 1e-4
    print(f"int4_matmul_dx: rel={ddx:.2e} [{'OK' if okdx else 'FAIL'}]")
    return int(not okdx)


def _check_fused_decode_int4(label):
    jax, jnp = _jax()
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
    )

    rng = np.random.default_rng(0)
    hw = _FD_GEOMS[label]
    cfg4 = LlamaConfig.tiny(quantize=True, quantize_bits=4,
                            quantize_lm_head=False, fuse_proj=True,
                            kv_cache_dtype="int8", **hw)
    fparams = LlamaForCausalLM(LlamaConfig.tiny(**hw)).init(
        jax.random.PRNGKey(0), jnp.ones((2, 5), jnp.int32)
    )["params"]
    params4 = jax.tree.map(
        jnp.asarray, fuse_llm_projections(quantize_llm_int4(fparams))
    )
    model4 = LlamaForCausalLM(cfg4)
    B, L, t = 2, 128, 5
    ids = jnp.asarray(rng.integers(1, 200, size=(B, t)), jnp.int32)
    cache = llama_init_cache(cfg4, B, L)
    mask = jnp.zeros((B, L), jnp.int32).at[:, :t].set(1)
    logits, cache = model4.apply(
        {"params": params4}, ids,
        attention_mask=mask, cache=cache, cache_index=jnp.int32(0),
    )
    tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
    mask_t = mask.at[:, t].set(1)
    want_logits, _ = model4.apply(
        {"params": params4}, tok[:, None],
        attention_mask=mask_t,
        position_ids=jnp.full((B, 1), t, jnp.int32),
        cache=cache, cache_index=jnp.int32(t),
    )
    dims = default_dims(cfg4, L)
    stacked = stack_llama_params(params4, cfg4)
    scache = stack_cache(cache)
    x = model4.apply({"params": params4}, tok[:, None],
                     method=model4.embed)[:, 0]
    x_out, new_kv = fused_decode_step(
        stacked, scache, x, mask, jnp.full((B,), t, jnp.int32),
        jnp.int32(t), dims, rope_theta=cfg4.rope_theta,
    )
    scatter_new_kv(scache, new_kv, jnp.int32(t))
    normed = model4.apply(
        {"params": params4}, x_out[:, None].astype(cfg4.dtype),
        method=lambda m, h: m.model.ln_f(h),
    )
    got_logits = model4.apply({"params": params4}, normed,
                              method=lambda m, h: m.logits(h))
    diff = float(jnp.abs(got_logits[:, 0].astype(jnp.float32)
                         - want_logits[:, 0].astype(jnp.float32)).max())
    top_ok = bool(
        (jnp.argmax(got_logits[:, 0], -1)
         == jnp.argmax(want_logits[:, 0], -1)).all()
    )
    # 4e-2: int4 grouped math carries real reassociation + act-quant
    # noise between the two execution orders — measured 1.2e-2 for this
    # GQA geometry in interpret mode (flax side exact-dequant) and
    # 2.7e-2 on chip (both sides act-quantized), top-1 stable and
    # deterministic in both. A broken unpack/group alignment produces
    # O(1) garbage, which this still catches; top-1 equality is the
    # hard gate.
    ok = diff < 4e-2 and top_ok
    print(f"fused_decode_int4[{label}]: logits={diff:.2e} top1={top_ok} "
          f"[{'OK' if ok else 'FAIL'}]")
    return int(not ok)


def check_fused_decode_int4_mha():
    return _check_fused_decode_int4("mha")


def check_fused_decode_int4_gqa():
    return _check_fused_decode_int4("gqa")


def check_int4_qlora_grad():
    """QuantDense(bits=4) fwd+bwd compiled on chip: a LoRA-wrapped int4
    matmul takes a grad step (the training-path composition, not just the
    standalone kernels)."""
    jax, jnp = _jax()
    from rlaifv_tpu.ops.int4_matmul import int4_matmul_grad, quantize_int4

    rng = np.random.default_rng(0)
    K, N, M, r = 512, 384, 64, 8
    packed, gsc = quantize_int4(
        rng.standard_normal((K, N)).astype(np.float32), group=128
    )
    packed, gsc = jnp.asarray(packed), jnp.asarray(gsc)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    a = jnp.asarray(rng.standard_normal((K, r)) * 0.01, jnp.float32)
    b = jnp.zeros((r, N), jnp.float32)

    def loss(ab):
        a, b = ab
        y = int4_matmul_grad(x, packed, gsc) + (x @ a) @ b
        return jnp.sum(y * y)

    val, g = jax.value_and_grad(loss)((a, b))
    gb = float(jnp.abs(g[1]).max())
    ok = bool(np.isfinite(float(val))) and np.isfinite(gb) and gb > 0
    print(f"int4_qlora_grad: loss={float(val):.3e} |db|max={gb:.3e} "
          f"[{'OK' if ok else 'FAIL'}]")
    return int(not ok)


# ordered so short tunnel-health windows bank the round-5 flagship first:
# the packed-int4 kernels, then the decode/fused families, then the rest
SECTIONS = {
    "int4_matmul": check_int4_matmul,
    "int4_dx": check_int4_dx,
    "int4_qlora_grad": check_int4_qlora_grad,
    "fused_decode_int4_mha": check_fused_decode_int4_mha,
    "fused_decode_int4_gqa": check_fused_decode_int4_gqa,
    "flash": check_flash,
    "flash_rect": check_flash_rect,
    "decode": check_decode,
    "decode_int8": check_decode_int8,
    "fused_head": check_fused_head,
    "fused_decode_mha": check_fused_decode_mha,
    "fused_decode_gqa": check_fused_decode_gqa,
}


# ---------------------------------------------------------------- runner


def run_section_inprocess(name: str) -> int:
    failures = SECTIONS[name]()
    print(f"section {name}: {'PASS' if not failures else 'FAIL'}")
    return 1 if failures else 0


def _flush_summary(results, t_start, final=False):
    n_pass = sum(1 for r in results.values() if r["status"] == "PASS")
    summary = {
        "passed": n_pass,
        "failed": len(results) - n_pass,
        "total": len(results),
        "complete": final,
        "seconds": round(time.time() - t_start, 1),
        "sections": {k: v["status"] for k, v in results.items()},
    }
    try:
        with open(os.path.join(_ROOT, "TPU_CHECKS.json"), "w") as f:
            json.dump({**summary, "detail": results}, f, indent=1)
    except OSError:
        pass
    return summary


def run_all(only=None, timeout_s: float = None) -> int:
    timeout_s = timeout_s or float(os.environ.get("TPU_CHECK_TIMEOUT_S", 900))
    names = [n for n in SECTIONS if not only or n in only]
    # resume support: previously-PASSed sections (recorded by an earlier,
    # possibly killed run) can be skipped with TPU_CHECK_RESUME=1 — healthy
    # tunnel windows are short, so the gate accumulates across them
    results = {}
    if os.environ.get("TPU_CHECK_RESUME") == "1":
        try:
            with open(os.path.join(_ROOT, "TPU_CHECKS.json")) as f:
                prev = json.load(f).get("detail", {})
            results = {k: v for k, v in prev.items()
                       if v.get("status") == "PASS" and k in names}
            if results:
                print("resuming; already PASSed:", ", ".join(results),
                      flush=True)
        except Exception:
            pass
    t_start = time.time()
    for name in names:
        if name in results:
            continue
        if os.environ.get("TPU_CHECK_HEALTH_ABORT") == "1":
            # the round-5 axon failure mode: integer-operand programs hang
            # while f32 runs — a quick probe between sections stops a run
            # the moment the tunnel sickens instead of burning the
            # per-section timeout on every remaining section
            try:
                hp = subprocess.run(
                    [sys.executable, "-c",
                     "import jax, jax.numpy as jnp, numpy as np;"
                     "a = jnp.asarray(np.arange(256, dtype=np.int32));"
                     "print(float(jax.jit(lambda x: x.astype("
                     "jnp.float32).sum())(a)))"],
                    capture_output=True, timeout=75,
                ).returncode == 0
            except Exception:
                hp = False
            if not hp:
                print(f"tunnel unhealthy before section {name} — "
                      "aborting this run (PASS record kept)", flush=True)
                break
        for attempt in (1, 2):
            t0 = time.time()
            status, tail = "PASS", ""
            try:
                p = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--section", name],
                    capture_output=True, text=True, timeout=timeout_s,
                    cwd=_ROOT,
                )
                out = (p.stdout or "") + (p.stderr or "")
                tail = out.strip()[-400:]
                if p.returncode != 0:
                    status = "FAIL"
            except subprocess.TimeoutExpired as e:
                status = "TIMEOUT"
                tail = str(e)[:200]
            dt = time.time() - t0
            line = f"[{status}] {name} ({dt:.0f}s, attempt {attempt})"
            print(line, flush=True)
            if status != "PASS":
                print("  " + "\n  ".join(tail.splitlines()[-6:]), flush=True)
            results[name] = {"status": status, "seconds": round(dt, 1),
                             "attempt": attempt, "tail": tail}
            _flush_summary(results, t_start)  # survive a mid-run kill
            if status == "PASS":
                break
    summary = _flush_summary(results, t_start, final=True)
    n_pass = summary["passed"]
    print("TPU kernel checks:",
          "PASS" if n_pass == len(results) else
          f"{len(results) - n_pass} FAILURES")
    print(json.dumps(summary), flush=True)
    return 0 if n_pass == len(results) else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--section", help="run one section in-process")
    ap.add_argument("--timeout", type=float, default=None)
    args = ap.parse_args()
    if args.section:
        return run_section_inprocess(args.section)
    only = None
    if os.environ.get("TPU_CHECK_ONLY"):
        only = set(os.environ["TPU_CHECK_ONLY"].split(","))
    return run_all(only=only, timeout_s=args.timeout)


if __name__ == "__main__":
    sys.exit(main())
