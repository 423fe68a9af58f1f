"""Compact LM head (head only at loss positions) parity vs the full path.

The compact path (train/dpo.py::get_batch_logps_compact, wired as
lm_head_impl="compact") must produce identical losses, metrics, and
gradients to the default XLA path: the gathered position set contains every
label != -100 position, and masked slots contribute exactly 0 in both.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rlaifv_tpu.constants import IGNORE_INDEX
from rlaifv_tpu.models.llava import LlavaConfig, LlavaForCausalLM
from rlaifv_tpu.train.dpo import get_batch_logps, get_batch_logps_compact
from rlaifv_tpu.train.train_step import (
    DPOHparams,
    LlavaDPOAdapter,
    dpo_loss_from_batch,
)

from tests.test_train_step import _fake_pair  # reuse the tiny-pair builder
from rlaifv_tpu.data.collator import DPOCollator


def _rand_case(rng, B=3, L=17, H=8, V=29, n_valid_max=6):
    hidden = jnp.asarray(rng.normal(size=(B, L, H)), jnp.float32)
    kernel = jnp.asarray(rng.normal(size=(H, V)), jnp.float32)
    labels = np.full((B, L), IGNORE_INDEX, np.int64)
    for b in range(B):
        n = int(rng.integers(1, n_valid_max + 1))
        # scatter valid labels at random (non-contiguous) positions
        pos = rng.choice(np.arange(1, L), size=n, replace=False)
        labels[b, pos] = rng.integers(0, V, size=n)
    return hidden, kernel, jnp.asarray(labels)


@pytest.mark.parametrize("shift", [True, False])
def test_compact_matches_full(shift):
    rng = np.random.default_rng(0)
    hidden, kernel, labels = _rand_case(rng)
    logits = hidden @ kernel
    full = get_batch_logps(logits, labels, shift=shift)
    comp = get_batch_logps_compact(hidden, kernel, labels, n_pos=8, shift=shift)
    np.testing.assert_allclose(comp.sum, full.sum, rtol=1e-6)
    np.testing.assert_allclose(comp.mean, full.mean, rtol=1e-6)
    assert int(comp.overflow.max()) == 0
    # every valid per-token logp appears, in order, in the compact slots
    tgt = labels[:, 1:] if shift else labels[:, :-1]
    for b in range(labels.shape[0]):
        valid = np.asarray(full.per_token[b])[np.asarray(tgt[b]) != IGNORE_INDEX]
        got = np.asarray(comp.per_token[b])[np.asarray(comp.mask[b])]
        np.testing.assert_allclose(got, valid, rtol=1e-6)


def test_compact_overflow_reported():
    rng = np.random.default_rng(1)
    hidden, kernel, labels = _rand_case(rng, n_valid_max=6)
    comp = get_batch_logps_compact(hidden, kernel, labels, n_pos=2, shift=True)
    n_valid = int((np.asarray(labels)[:, 1:] != IGNORE_INDEX).sum(-1).max())
    assert int(comp.overflow.max()) == n_valid - 2


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = LlavaConfig.tiny()
    model = LlavaForCausalLM(cfg)
    adapter = LlavaDPOAdapter(model)
    rng = np.random.default_rng(7)
    coll = DPOCollator(
        pad_token_id=0, max_len=48, num_patches=cfg.num_image_tokens, beta=0.1
    )
    pairs = [_fake_pair(rng, cfg.llm.vocab_size, cfg.vision.image_size)
             for _ in range(3)]
    for rej, win in pairs:  # per-token ref logps for the token-weighted path
        win["ref_win_per_token_logp"] = rng.normal(
            -2, 0.5, size=len(win["input_ids"]) - 1
        ).astype(np.float32)
        rej["ref_rej_per_token_logp"] = rng.normal(
            -2, 0.5, size=len(rej["input_ids"]) - 1
        ).astype(np.float32)
    batch = {k: jnp.asarray(v) for k, v in coll(pairs).items()}
    params = model.init(
        jax.random.PRNGKey(0),
        batch["input_ids"][:2],
        images=batch["images"][:2],
        image_starts=batch["image_starts"][:2],
    )["params"]
    return adapter, batch, params


@pytest.mark.parametrize(
    "hp_kwargs",
    [
        # the base case compiles first (cold cache) and dominates the file's
        # wall time -> slow tier; the variants reuse most of the cache
        pytest.param({}, marks=pytest.mark.slow),
        pytest.param({"dpo_use_average": True}, marks=pytest.mark.slow),
        pytest.param({"dpo_token_weighted": True}, marks=pytest.mark.slow),
        pytest.param({"dpo_token_weighted": True, "dpo_use_average": True},
                     marks=pytest.mark.slow),
        # the cold compile alone is ~18 s on this host, so the grads gate
        # lives entirely in the slow tier; test_compact_matches_full is the
        # fast-tier compact-head gate (round-4 re-tier, <5 min budget)
        pytest.param({"sft_weight": 0.5}, marks=pytest.mark.slow),
    ],
)
def test_compact_loss_and_grads_match_xla(tiny_setup, hp_kwargs):
    adapter, batch, params = tiny_setup
    out = {}
    for impl in ("xla", "compact"):
        hp = DPOHparams(lm_head_impl=impl, compact_len=16, **hp_kwargs)
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: dpo_loss_from_batch(adapter, p, batch, hp), has_aux=True
        )(params)
        out[impl] = (loss, metrics, grads)
    loss_x, met_x, g_x = out["xla"]
    loss_c, met_c, g_c = out["compact"]
    np.testing.assert_allclose(loss_c, loss_x, rtol=1e-5, atol=1e-6)
    assert int(met_c["compact_overflow"]) == 0
    for k in met_x:
        np.testing.assert_allclose(
            met_c[k], met_x[k], rtol=1e-5, atol=1e-6, err_msg=k
        )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-6),
        g_c, g_x,
    )


def test_compact_requires_len(tiny_setup):
    adapter, batch, params = tiny_setup
    hp = DPOHparams(lm_head_impl="compact", compact_len=0)
    with pytest.raises(ValueError):
        dpo_loss_from_batch(adapter, params, batch, hp)


@pytest.mark.slow
def test_score_fn_compact_matches_xla(tiny_setup):
    """Ref-logp precompute: compact scoring returns identical sums/avgs and
    a full-shape per_token identical to the xla path (parquet contract)."""
    from rlaifv_tpu.train.ref_logp import make_score_fn

    adapter, batch, params = tiny_setup
    model = adapter.module
    jb = {k: v for k, v in batch.items()
          if k in ("input_ids", "labels", "attention_mask", "images",
                   "image_starts")}
    s_x = make_score_fn(model, params)(jb)
    s_c = make_score_fn(model, params, lm_head_impl="compact",
                        compact_len=16)(jb)
    for a, b in zip(s_c, s_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_score_rows_compact_overflow_raises(tiny_setup):
    from rlaifv_tpu.train.ref_logp import make_score_fn

    with pytest.raises(ValueError):
        make_score_fn(None, None, lm_head_impl="compact", compact_len=0)
