"""Measure the fused LM-head kernel vs the XLA logits path on the real chip.

Timing on the axon tunnel requires K on-device steps inside one lax.scan with
a loop-carried data dependency (block_until_ready returns early; XLA hoists
invariant bodies), differencing K=1 vs K=N to cancel the RPC overhead.

Usage: python scripts/perf_fused_head.py [M] [H] [V] [mode]
mode: "fwdbwd" (default) or "fwd" — fwd-only is the scoring-pass shape
(ref-logp precompute), where the H-blocked forward kernel applies.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

    from rlaifv_tpu.ops.fused_head import fused_target_logp, target_logp_xla

    M = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    V = int(sys.argv[3]) if len(sys.argv) > 3 else 32000
    mode = sys.argv[4] if len(sys.argv) > 4 else "fwdbwd"
    dtype = jnp.bfloat16

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(M, H)) * 0.3, dtype)
    w = jnp.asarray(rng.normal(size=(H, V)) * 0.02, dtype)
    y = jnp.asarray(rng.integers(0, V, size=(M,)), jnp.int32)
    g = jnp.asarray(rng.normal(size=(M,)), jnp.float32)

    def step(fn):
        def loss(x, w):
            return (fn(x, w, y) * g).sum()

        if mode == "fwd":
            def body(carry, _):
                x, w = carry
                l = loss(x, w)
                # loop-carried dependency so XLA cannot hoist the body
                return (x + 1e-9 * l.astype(x.dtype), w), l

            return body

        def body(carry, _):
            x, w = carry
            l, (dx, dw) = jax.value_and_grad(loss, argnums=(0, 1))(x, w)
            # loop-carried dependency so XLA cannot hoist the body
            return (x + 1e-6 * dx.astype(x.dtype),
                    w + 1e-6 * dw.astype(w.dtype)), l

        return body

    def timed(fn, K):
        @jax.jit
        def run(x, w):
            (xf, wf), ls = jax.lax.scan(step(fn), (x, w), None, length=K)
            return ls[-1] + (xf.sum() + wf.sum()).astype(jnp.float32)

        r = float(run(x0, w))  # compile + warm
        t0 = time.perf_counter()
        r = float(run(x0, w))
        return time.perf_counter() - t0, r

    K = 16
    for name, fn in (("fused", fused_target_logp), ("xla", target_logp_xla)):
        t1, _ = timed(fn, 1)
        tK, _ = timed(fn, K)
        per = (tK - t1) / (K - 1) * 1e3
        print(f"{name}: {per:.3f} ms/step ({mode})  M={M} H={H} V={V}")


if __name__ == "__main__":
    main()
