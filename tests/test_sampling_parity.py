"""Sampling ops parity vs HF logits processors (the reference decodes
through HF generate, so these define the semantics)."""
import numpy as np
import pytest
import torch
import jax.numpy as jnp

from rlaifv_tpu.genai.sampling import (
    NEG_INF,
    apply_repetition_penalty,
    apply_top_k,
    apply_top_p,
)


def test_repetition_penalty_matches_hf():
    from transformers import RepetitionPenaltyLogitsProcessor

    rng = np.random.default_rng(0)
    B, V = 3, 50
    logits = rng.normal(size=(B, V)).astype(np.float32) * 3
    input_ids = rng.integers(0, V, size=(B, 10))

    proc = RepetitionPenaltyLogitsProcessor(penalty=1.3)
    want = proc(torch.tensor(input_ids), torch.tensor(logits)).numpy()

    seen = np.zeros((B, V), np.int32)
    for b in range(B):
        seen[b, input_ids[b]] = 1
    got = np.asarray(apply_repetition_penalty(
        jnp.asarray(logits), jnp.asarray(seen), 1.3
    ))
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("k", [1, 5, 30])
def test_top_k_matches_hf(k):
    from transformers import TopKLogitsWarper

    rng = np.random.default_rng(1)
    B, V = 2, 64
    logits = rng.normal(size=(B, V)).astype(np.float32) * 2

    warper = TopKLogitsWarper(top_k=k)
    want = warper(None, torch.tensor(logits)).numpy()
    got = np.asarray(apply_top_k(jnp.asarray(logits), k))

    # same kept/masked sets (mask values differ: -inf vs -1e10)
    np.testing.assert_array_equal(got > NEG_INF / 2, np.isfinite(want))
    kept = got > NEG_INF / 2
    np.testing.assert_allclose(got[kept], want[np.isfinite(want)], atol=1e-6)


@pytest.mark.parametrize("p", [0.3, 0.9])
def test_top_p_matches_hf(p):
    from transformers import TopPLogitsWarper

    rng = np.random.default_rng(2)
    B, V = 2, 64
    logits = rng.normal(size=(B, V)).astype(np.float32) * 2

    warper = TopPLogitsWarper(top_p=p)
    want = warper(None, torch.tensor(logits)).numpy()
    got = np.asarray(apply_top_p(jnp.asarray(logits), p))

    got_kept = got > NEG_INF / 2
    want_kept = np.isfinite(want)
    np.testing.assert_array_equal(got_kept, want_kept)
    np.testing.assert_allclose(got[got_kept], want[want_kept], atol=1e-6)
