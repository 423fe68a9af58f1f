"""Decode-attention kernel parity (interpret mode on CPU; compiled parity
runs in tests/run_tpu_checks.py)."""
import numpy as np
import pytest
import jax.numpy as jnp

from rlaifv_tpu.ops.attention import _build_bias, dense_attention, repeat_kv
from rlaifv_tpu.ops.decode_attention import (
    decode_attention,
    decode_attention_prefix,
)


def test_decode_attention_interpret_parity():
    rng = np.random.default_rng(0)
    B, L, H, KVH, D = 2, 32, 4, 2, 16
    q = jnp.asarray(rng.normal(size=(B, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, L, KVH, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, L, KVH, D)), jnp.float32)
    mask = np.ones((B, L), np.int32)
    mask[0, 20:] = 0
    mask = jnp.asarray(mask)

    got = decode_attention(q, k, v, mask, interpret=True)
    bias = _build_bias(1, L, mask, False, None, B)
    want = dense_attention(
        q[:, None], repeat_kv(k, H // KVH), repeat_kv(v, H // KVH), bias
    )[:, 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("valid_len", [8, 20, 32])
def test_decode_attention_prefix_parity(valid_len):
    """Prefix kernel == dense attention over the masked prefix, for any
    valid_len (including partial last block and full length)."""
    rng = np.random.default_rng(1)
    B, L, H, KVH, D = 2, 32, 4, 2, 16
    q = jnp.asarray(rng.normal(size=(B, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, L, KVH, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, L, KVH, D)), jnp.float32)
    mask = np.zeros((B, L), np.int32)
    mask[0, :valid_len] = 1
    mask[1, 2:valid_len] = 1  # ragged row start (left-pad style)
    mask = jnp.asarray(mask)

    got = decode_attention_prefix(
        q, k, v, mask, jnp.int32(valid_len), block_l=8, interpret=True
    )
    bias = _build_bias(1, L, mask, False, None, B)
    want = dense_attention(
        q[:, None], repeat_kv(k, H // KVH), repeat_kv(v, H // KVH), bias
    )[:, 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_forced_flash_rejects_traced_q_offset():
    """impl='flash' with a traced q_offset must raise instead of silently
    masking with q_offset=0 (ADVICE r3: ops/attention.py)."""
    import jax
    import pytest

    from rlaifv_tpu.ops.attention import multi_head_attention

    q = jnp.zeros((1, 128, 4, 32))
    kv = jnp.zeros((1, 160, 4, 32))

    def f(off):
        return multi_head_attention(q, kv, kv, impl="flash", q_offset=off)

    with pytest.raises(ValueError, match="static"):
        jax.jit(f)(jnp.int32(32))
