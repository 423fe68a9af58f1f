"""Fused LM-head kernel parity (interpret mode on CPU; compiled parity and
timing run in tests/run_tpu_checks.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rlaifv_tpu.ops.fused_head import fused_target_logp, target_logp_xla


def _case(rng, M, H, V):
    x = jnp.asarray(rng.normal(size=(M, H)) * 0.3, jnp.float32)
    w = jnp.asarray(rng.normal(size=(H, V)) * 0.3, jnp.float32)
    y = jnp.asarray(rng.integers(0, V, size=(M,)), jnp.int32)
    return x, w, y


@pytest.mark.parametrize("M,H,V,bm,bv", [
    (16, 32, 256, 8, 128),       # exact tiling
    (16, 32, 300, 8, 128),       # vocab pad (300 -> 384)
    (13, 32, 256, 8, 128),       # row pad (13 -> 16)
    (16, 32, 256, 16, 256),      # single tile each way
])
def test_fwd_parity(M, H, V, bm, bv):
    rng = np.random.default_rng(0)
    x, w, y = _case(rng, M, H, V)
    got = fused_target_logp(x, w, y, block_m=bm, block_v=bv, interpret=True)
    want = target_logp_xla(x, w, y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fwd_batch_shape():
    rng = np.random.default_rng(1)
    x, w, y = _case(rng, 24, 32, 256)
    x3 = x.reshape(2, 12, 32)
    y3 = y.reshape(2, 12)
    got = fused_target_logp(x3, w, y3, block_m=8, block_v=128, interpret=True)
    assert got.shape == (2, 12)
    want = target_logp_xla(x, w, y).reshape(2, 12)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("V,bv", [(256, 128), (300, 128)])
def test_grad_parity(V, bv):
    rng = np.random.default_rng(2)
    M, H = 16, 32
    x, w, y = _case(rng, M, H, V)
    g = jnp.asarray(rng.normal(size=(M,)), jnp.float32)

    def loss_fused(x, w):
        return (fused_target_logp(x, w, y, block_m=8, block_v=bv,
                                  interpret=True) * g).sum()

    def loss_xla(x, w):
        return (target_logp_xla(x, w, y) * g).sum()

    dxf, dwf = jax.grad(loss_fused, argnums=(0, 1))(x, w)
    dxx, dwx = jax.grad(loss_xla, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(dxf), np.asarray(dxx),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dwf), np.asarray(dwx),
                               rtol=1e-4, atol=1e-5)


def test_grad_row_padding():
    # M=13 pads to 16: padded rows must not contribute to dW.
    rng = np.random.default_rng(3)
    M, H, V = 13, 32, 256
    x, w, y = _case(rng, M, H, V)
    g = jnp.asarray(rng.normal(size=(M,)), jnp.float32)

    dwf = jax.grad(
        lambda w: (fused_target_logp(x, w, y, block_m=8, block_v=128,
                                     interpret=True) * g).sum()
    )(w)
    dwx = jax.grad(lambda w: (target_logp_xla(x, w, y) * g).sum())(w)
    np.testing.assert_allclose(np.asarray(dwf), np.asarray(dwx),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("M,H,V,bm,bv,bh", [
    (16, 64, 256, 8, 128, 32),    # H split in 2
    (16, 96, 300, 8, 128, 32),    # H split in 3 + vocab pad
    (13, 64, 256, 8, 128, 32),    # row pad
    (16, 80, 256, 8, 128, 32),    # H pad (80 -> 96)
])
def test_fwd_hblocked_parity(M, H, V, bm, bv, bh):
    rng = np.random.default_rng(3)
    x, w, y = _case(rng, M, H, V)
    got = fused_target_logp(x, w, y, block_m=bm, block_v=bv, block_h=bh,
                            interpret=True)
    want = target_logp_xla(x, w, y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_grad_through_hblocked_fwd():
    """The backward kernels are H-unblocked; grads must still be exact when
    the forward ran H-blocked (lse handoff, independent row padding)."""
    rng = np.random.default_rng(4)
    M, H, V = 13, 64, 300
    x, w, y = _case(rng, M, H, V)
    g = jnp.asarray(rng.normal(size=(M,)), jnp.float32)

    def loss_fused(x, w):
        return (fused_target_logp(x, w, y, block_m=8, block_v=128,
                                  block_h=32, interpret=True) * g).sum()

    def loss_xla(x, w):
        return (target_logp_xla(x, w, y) * g).sum()

    dxf, dwf = jax.grad(loss_fused, argnums=(0, 1))(x, w)
    dxx, dwx = jax.grad(loss_xla, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(dxf), np.asarray(dxx),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dwf), np.asarray(dwx),
                               rtol=1e-4, atol=1e-5)
