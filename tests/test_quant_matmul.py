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
