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
