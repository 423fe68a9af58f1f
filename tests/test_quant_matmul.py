"""int8-weight matmul kernel parity (interpret mode; compiled parity and
decode timing run on hardware). The kernel dynamically quantizes the
activation stripe per row and uses the int8 MXU path; the reference here
replicates that math exactly, plus a loose check against float."""
import numpy as np
import pytest
import jax.numpy as jnp

from rlaifv_tpu.models.llama import quantize_kernel_int8
from rlaifv_tpu.ops.quant_matmul import int8_matmul


def _exact_ref(x, q, s):
    x = np.asarray(x, np.float32)
    sx = np.maximum(np.abs(x).max(axis=-1, keepdims=True), 1e-20) / 127.0
    xq = np.clip(np.round(x / sx), -127, 127)
    return (xq @ q.astype(np.float32)) * sx * s[None, :]


@pytest.mark.parametrize("M,K,N", [(8, 32, 128), (5, 32, 300), (257, 64, 512)])
def test_int8_matmul_parity(M, K, N):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(M, K)) * 0.5, jnp.float32)
    w = rng.normal(size=(K, N)).astype(np.float32) * 0.1
    q, s = quantize_kernel_int8(w)

    got = np.asarray(int8_matmul(x, jnp.asarray(q), jnp.asarray(s),
                                 block_m=8, block_n=128, interpret=True))
    np.testing.assert_allclose(got, _exact_ref(x, q, s), rtol=1e-4, atol=1e-5)

    # sane vs the float product (both weight + activation quant error)
    want = np.asarray(x) @ w
    err = np.abs(got - want).max()
    assert err < 0.05 * np.abs(want).max() + 0.05


def test_int8_matmul_batched_shape():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 7, 32)), jnp.float32)
    w = rng.normal(size=(32, 128)).astype(np.float32)
    q, s = quantize_kernel_int8(w)
    out = int8_matmul(x, jnp.asarray(q), jnp.asarray(s),
                      block_m=8, block_n=128, interpret=True)
    assert out.shape == (2, 7, 128)


def _exact_dx_ref(dy, q, s):
    dy = np.asarray(dy, np.float32) * s[None, :]
    sy = np.maximum(np.abs(dy).max(axis=-1, keepdims=True), 1e-20) / 127.0
    dyq = np.clip(np.round(dy / sy), -127, 127)
    return (dyq @ q.astype(np.float32).T) * sy


@pytest.mark.parametrize("M,K,N", [(8, 32, 128), (13, 64, 300), (257, 128, 512)])
def test_int8_matmul_dx_parity(M, K, N):
    from rlaifv_tpu.ops.quant_matmul import int8_matmul_dx

    rng = np.random.default_rng(2)
    dy = jnp.asarray(rng.normal(size=(M, N)) * 0.5, jnp.float32)
    w = rng.normal(size=(K, N)).astype(np.float32) * 0.1
    q, s = quantize_kernel_int8(w.T)  # (N, K) quant -> transpose back
    q, s = q.T, None
    # per-output-channel scales live on N for the forward layout (K, N)
    q2, s2 = quantize_kernel_int8(w)
    got = np.asarray(int8_matmul_dx(dy, jnp.asarray(q2), jnp.asarray(s2),
                                    block_m=8, block_k=64, interpret=True))
    np.testing.assert_allclose(got, _exact_dx_ref(dy, q2, s2),
                               rtol=1e-4, atol=1e-5)
    # sane vs the float product
    want = (np.asarray(dy) * s2[None, :]) @ q2.astype(np.float32).T
    assert np.abs(got - want).max() < 0.05 * np.abs(want).max() + 0.05


def test_int8_matmul_grad_flows():
    """jax.grad through int8_matmul_grad: dx matches the dx kernel, the
    frozen int8 weight gets a symbolic-zero cotangent (no crash)."""
    from rlaifv_tpu.ops.quant_matmul import int8_matmul_dx, int8_matmul_grad

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(8, 32)) * 0.5, jnp.float32)
    w = rng.normal(size=(32, 128)).astype(np.float32) * 0.1
    q, s = quantize_kernel_int8(w)
    q, s = jnp.asarray(q), jnp.asarray(s)
    g = jnp.asarray(rng.normal(size=(8, 128)), jnp.float32)

    import jax

    dx = jax.grad(
        lambda x: (int8_matmul_grad(x, q, s) * g).sum()
    )(x)
    want = int8_matmul_dx(g, q, s, block_m=8, block_k=32, interpret=True)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_dequant_dispatch_strategies_agree():
    """The two int8 strategies behind int8_matmul_grad (Pallas kernel at
    decode rows, XLA dequant at prefill/training rows — quant_matmul.py
    INT8_DEQUANT_MIN_M) compute the same product up to the kernel's
    activation-quantization error, so the shape dispatch is numerics-safe
    on either side of the crossover."""
    from rlaifv_tpu.ops.quant_matmul import (
        _dequant_matmul,
        _dequant_matmul_dx,
        int8_matmul_dx,
    )

    rng = np.random.default_rng(4)
    for M in (8, 257):  # below / above INT8_DEQUANT_MIN_M
        x = jnp.asarray(rng.normal(size=(M, 64)) * 0.5, jnp.float32)
        w = rng.normal(size=(64, 256)).astype(np.float32) * 0.1
        q, s = quantize_kernel_int8(w)
        q, s = jnp.asarray(q), jnp.asarray(s)

        exact = np.asarray(x, np.float32) @ (
            np.asarray(q, np.float32) * np.asarray(s)[None, :]
        )
        deq = np.asarray(_dequant_matmul(x, q, s))
        np.testing.assert_allclose(deq, exact, rtol=1e-5, atol=1e-5)
        ker = np.asarray(int8_matmul(x, q, s, block_m=8, block_n=128,
                                     interpret=True))
        scale = np.abs(exact).max() + 1e-6
        assert np.abs(ker - deq).max() < 0.02 * scale

        dy = jnp.asarray(rng.normal(size=(M, 256)) * 0.5, jnp.float32)
        exact_dx = (np.asarray(dy) * np.asarray(s)[None, :]) @ np.asarray(
            q, np.float32).T
        deq_dx = np.asarray(_dequant_matmul_dx(dy, q, s))
        np.testing.assert_allclose(deq_dx, exact_dx, rtol=1e-5, atol=1e-5)
        ker_dx = np.asarray(int8_matmul_dx(dy, q, s, block_m=8, block_k=64,
                                           interpret=True))
        dscale = np.abs(exact_dx).max() + 1e-6
        assert np.abs(ker_dx - deq_dx).max() < 0.02 * dscale


def test_grad_through_dequant_path():
    """jax.grad through the XLA-dequant strategy matches the analytic dx."""
    import jax

    from rlaifv_tpu.ops.quant_matmul import _dequant_matmul

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(16, 32)) * 0.5, jnp.float32)
    w = rng.normal(size=(32, 128)).astype(np.float32) * 0.1
    q, s = quantize_kernel_int8(w)
    q, s = jnp.asarray(q), jnp.asarray(s)
    g = jnp.asarray(rng.normal(size=(16, 128)), jnp.float32)

    dx = jax.grad(lambda x: (_dequant_matmul(x, q, s) * g).sum())(x)
    want = np.asarray(g) @ (np.asarray(q, np.float32)
                            * np.asarray(s)[None, :]).T
    np.testing.assert_allclose(np.asarray(dx), want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("M,K,N", [(8, 32, 128), (257, 64, 512)])
def test_int8_matmul_prequant_parity(M, K, N):
    """Prequantized-activation kernel == in-kernel-quantization kernel
    (identical rowwise activation quantization, different schedule)."""
    from rlaifv_tpu.ops.quant_matmul import int8_matmul_prequant

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(M, K)) * 0.5, jnp.float32)
    w = rng.normal(size=(K, N)).astype(np.float32) * 0.1
    q, s = quantize_kernel_int8(w)
    q, s = jnp.asarray(q), jnp.asarray(s)

    got = np.asarray(int8_matmul_prequant(x, q, s, block_m=8, block_n=128,
                                          interpret=True))
    want = np.asarray(int8_matmul(x, q, s, block_m=8, block_n=128,
                                  interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("M,K,N", [(8, 32, 128), (257, 128, 512)])
def test_int8_matmul_dx_prequant_parity(M, K, N):
    """Prequantized dx kernel == in-kernel-quantization dx kernel."""
    from rlaifv_tpu.ops.quant_matmul import (
        int8_matmul_dx,
        int8_matmul_dx_prequant,
    )

    rng = np.random.default_rng(7)
    dy = jnp.asarray(rng.normal(size=(M, N)) * 0.5, jnp.float32)
    w = rng.normal(size=(K, N)).astype(np.float32) * 0.1
    q, s = quantize_kernel_int8(w)
    q, s = jnp.asarray(q), jnp.asarray(s)

    got = np.asarray(int8_matmul_dx_prequant(dy, q, s, block_m=8,
                                             block_k=64, interpret=True))
    want = np.asarray(int8_matmul_dx(dy, q, s, block_m=8, block_k=64,
                                     interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
