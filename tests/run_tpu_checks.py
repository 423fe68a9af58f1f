"""Run the TPU-only kernel checks on the real chip.

tests/conftest.py pins pytest to the 8-device virtual CPU mesh, so Pallas
kernel tests skip there. This standalone runner executes the same checks
compiled on hardware:

    python tests/run_tpu_checks.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    assert jax.default_backend() == "tpu", (
        f"needs a TPU backend, got {jax.default_backend()}"
    )
    import jax.numpy as jnp

    from rlaifv_tpu.ops.attention import _build_bias, dense_attention, repeat_kv
    from rlaifv_tpu.ops.decode_attention import decode_attention
    from rlaifv_tpu.ops.flash_attention import flash_attention
    from rlaifv_tpu.ops.fused_head import fused_target_logp, target_logp_xla

    def ref(q, k, v, mask, causal=True):
        # HIGHEST: the fp32 default on this MXU is a single bf16 pass
        # (~1e-2 abs error at these shapes) — an inaccurate reference that
        # previously matched the kernel only because both made the same
        # rounding. The flash kernels now pin HIGHEST for fp32 inputs, so
        # the reference must be exact to compare against.
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

    # rectangular shared-prefix shape: suffix queries (W) over prefix+suffix
    # keys (P+W), static q_offset=P (the paired DPO training path).
    # (2, 384, 256): aligned fast path; (2, 601, 423): the real-prompt
    # unaligned case riding the transparent-padding wrapper.
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

    # int8 KV cache prefix kernel vs dense-over-dequantized oracle
    from rlaifv_tpu.ops.decode_attention import (
        decode_attention_prefix_int8,
        dequantize_kv,
        quantize_kv,
    )

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

    for dtype, tol_f, tol_g in ((jnp.float32, 3e-4, 2e-3), (jnp.bfloat16, 6e-2, 8e-2)):
        M, H, V = 2048, 1024, 32000
        x = jnp.asarray(rng.normal(size=(M, H)) * 0.3, dtype)
        w = jnp.asarray(rng.normal(size=(H, V)) * 0.02, dtype)
        y = jnp.asarray(rng.integers(0, V, size=(M,)), jnp.int32)
        g = jnp.asarray(rng.normal(size=(M,)), jnp.float32)

        # f32 oracle at HIGHEST matmul precision (XLA's default f32 matmul is
        # bf16 passes on TPU — less accurate than the kernel, which pins
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

    # multi-layer fused decode step vs the flax per-layer path, both
    # COMPILED on the chip (same int8 math on both sides here, unlike the
    # CPU interpret-mode test where the flax fallback skips act quant)
    sys.path.insert(0, os.path.dirname(__file__))
    from test_fused_decode import _setup_from

    from rlaifv_tpu.models.llama import LlamaConfig
    from rlaifv_tpu.ops.fused_decode import (
        default_dims,
        fused_decode_step,
        scatter_new_kv,
        stack_cache,
        stack_llama_params,
    )

    # hardware-legal tiny geometries (lane dims must be 128-multiples on
    # the chip; the pytest tiny config's head_dim=16 only works in
    # interpret): MHA (vicuna-7B shape) and GQA (llama3-8B shape, n_rep=2)
    for label, hw in (
        ("mha", dict(hidden_size=256, intermediate_size=512, num_heads=2,
                     num_kv_heads=2, head_dim=128)),
        ("gqa", dict(hidden_size=512, intermediate_size=512, num_heads=4,
                     num_kv_heads=2, head_dim=128)),
    ):
        hw = dict(quantize=True, quantize_lm_head=False,
                  kv_cache_dtype="int8", **hw)
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
        failures += not ok
        print(f"fused_decode[{label}]: logits={diff:.2e} top1={top_ok} "
              f"[{'OK' if ok else 'FAIL'}]")

    # ---- int4 (native s4 + group scales) on hardware: standalone matmul
    # and dx vs the integer-math oracle, then the fused decode int4 mode.
    # These kernels were designed against compile probes (i8 shifts do not
    # legalize; s4 loads/converts do) — this is the execution check.
    from rlaifv_tpu.ops.int4_matmul import (
        int4_matmul,
        int4_matmul_dx,
        quantize_int4,
    )

    M, K, N = 16, 512, 384
    x = rng.standard_normal((M, K)).astype(np.float32)
    w = rng.standard_normal((K, N)).astype(np.float32)
    q4, gsc = quantize_int4(w, group=128)

    def oracle_fwd(x, q4, scale, group=128):
        sx = np.maximum(np.abs(x).max(axis=1, keepdims=True), 1e-20) / 127.0
        xq = np.clip(np.round(x / sx), -127, 127).astype(np.int32)
        q = np.asarray(q4).astype(np.int32)
        acc = np.zeros((x.shape[0], q.shape[1]), np.float32)
        for gi in range(q.shape[0] // group):
            sl = slice(gi * group, (gi + 1) * group)
            acc += (xq[:, sl] @ q[sl]).astype(np.float32) * scale[gi][None, :]
        return acc * sx

    got4 = np.asarray(int4_matmul(jnp.asarray(x), jnp.asarray(q4),
                                  jnp.asarray(gsc), group=128), np.float32)
    want4 = oracle_fwd(x, q4, gsc)
    d4 = float(np.abs(got4 - want4).max() / (np.abs(want4).max() + 1e-9))
    ok4 = d4 < 1e-4
    failures += not ok4
    print(f"int4_matmul: rel={d4:.2e} [{'OK' if ok4 else 'FAIL'}]")

    dy = rng.standard_normal((M, N)).astype(np.float32)

    def oracle_dx(dy, q4, scale, group=128):
        q = np.asarray(q4).astype(np.int32)
        cols = []
        for gi in range(q.shape[0] // group):
            dys = dy * scale[gi][None, :]
            sy = np.maximum(np.abs(dys).max(axis=1, keepdims=True),
                            1e-20) / 127.0
            dyq = np.clip(np.round(dys / sy), -127, 127).astype(np.int32)
            cols.append(
                (dyq @ q[gi * group : (gi + 1) * group].T).astype(np.float32)
                * sy
            )
        return np.concatenate(cols, axis=1)

    gotdx = np.asarray(int4_matmul_dx(jnp.asarray(dy), jnp.asarray(q4),
                                      jnp.asarray(gsc), group=128),
                       np.float32)
    wantdx = oracle_dx(dy, q4, gsc)
    ddx = float(np.abs(gotdx - wantdx).max() / (np.abs(wantdx).max() + 1e-9))
    okdx = ddx < 1e-4
    failures += not okdx
    print(f"int4_matmul_dx: rel={ddx:.2e} [{'OK' if okdx else 'FAIL'}]")

    from rlaifv_tpu.models.convert import (
        fuse_llm_projections,
        quantize_llm_int4,
    )
    from rlaifv_tpu.models.llama import LlamaForCausalLM, llama_init_cache

    for label, hw in (
        ("mha", dict(hidden_size=256, intermediate_size=512, num_heads=2,
                     num_kv_heads=2, head_dim=128)),
        ("gqa", dict(hidden_size=512, intermediate_size=512, num_heads=4,
                     num_kv_heads=2, head_dim=128)),
    ):
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
        ok = diff < 2e-2 and top_ok
        failures += not ok
        print(f"fused_decode_int4[{label}]: logits={diff:.2e} top1={top_ok} "
              f"[{'OK' if ok else 'FAIL'}]")

    print("TPU kernel checks:", "PASS" if failures == 0 else f"{failures} FAILURES")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
