"""Parity tests for DPO loss / batch-logp math vs the torch reference formulas.

The torch expressions below restate the reference math
(muffin/eval/muffin_inference_logp.py:82-115, muffin/train/trainers.py:91-137)
as an oracle; our jnp implementation must match to float tolerance.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from rlaifv_tpu.constants import IGNORE_INDEX
from rlaifv_tpu.train.dpo import (
    compute_weighted_logp,
    dpo_loss,
    get_batch_logps,
)


def _torch_batch_logps(logits, labels, shift=True):
    if shift:
        labels = labels[:, 1:].clone()
    else:
        labels = labels[:, :-1].clone()
    logits = logits[:, :-1, :]
    loss_mask = labels != IGNORE_INDEX
    labels[labels == IGNORE_INDEX] = 0
    per_token = torch.gather(
        logits.log_softmax(-1), dim=2, index=labels.unsqueeze(2)
    ).squeeze(2)
    log_prob = (per_token * loss_mask).sum(-1)
    avg = log_prob / loss_mask.sum(-1)
    return per_token * loss_mask, log_prob, avg


@pytest.mark.parametrize("shift", [True, False])
def test_batch_logps_parity(shift):
    rng = np.random.default_rng(0)
    B, L, V = 3, 17, 53
    logits = rng.normal(size=(B, L, V)).astype(np.float32) * 3.0
    labels = rng.integers(0, V, size=(B, L)).astype(np.int64)
    # sprinkle ignore positions incl. full prefix masking
    labels[:, :4] = IGNORE_INDEX
    labels[1, 9:12] = IGNORE_INDEX

    pt, s, a = _torch_batch_logps(
        torch.tensor(logits), torch.tensor(labels), shift=shift
    )
    ours = get_batch_logps(jnp.asarray(logits), jnp.asarray(labels), shift=shift)

    np.testing.assert_allclose(np.asarray(ours.per_token), pt.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours.sum), s.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours.mean), a.numpy(), atol=1e-5)


def test_dpo_loss_parity():
    rng = np.random.default_rng(1)
    B = 8
    pw, pl, rw, rl = (rng.normal(size=B).astype(np.float32) * 20 for _ in range(4))
    beta = 0.1

    # torch oracle (trainers.py:114-126)
    t_logits = torch.tensor(pw - pl) - torch.tensor(rw - rl)
    t_losses = -F.logsigmoid(beta * t_logits)
    t_cr = beta * torch.tensor(pw - rw)
    t_rr = beta * torch.tensor(pl - rl)

    losses, cr, rr = dpo_loss(
        jnp.asarray(pw), jnp.asarray(pl), jnp.asarray(rw), jnp.asarray(rl), beta
    )
    np.testing.assert_allclose(np.asarray(losses), t_losses.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(cr), t_cr.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(rr), t_rr.numpy(), atol=1e-6)

    # reference_free zeroes the ref ratio
    losses_rf, _, _ = dpo_loss(
        jnp.asarray(pw), jnp.asarray(pl), jnp.asarray(rw), jnp.asarray(rl),
        beta, reference_free=True,
    )
    t_losses_rf = -F.logsigmoid(beta * torch.tensor(pw - pl))
    np.testing.assert_allclose(np.asarray(losses_rf), t_losses_rf.numpy(), atol=1e-6)


def test_dpo_loss_hand_computed():
    # Single pair: margin = (2 - 1) - (0.5 - 0.2) = 0.7, beta=0.5
    losses, cr, rr = dpo_loss(
        jnp.array([2.0]), jnp.array([1.0]), jnp.array([0.5]), jnp.array([0.2]), 0.5
    )
    expect = -np.log(1.0 / (1.0 + np.exp(-0.5 * 0.7)))
    np.testing.assert_allclose(np.asarray(losses), [expect], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(cr), [0.5 * 1.5], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(rr), [0.5 * 0.8], rtol=1e-6)


@pytest.mark.parametrize("use_average", [False, True])
def test_weighted_logp_parity(use_average):
    rng = np.random.default_rng(2)
    B, L = 4, 13
    per_token = rng.normal(size=(B, L - 1)).astype(np.float32)
    labels = rng.integers(0, 100, size=(B, L)).astype(np.int64)
    labels[:, :3] = IGNORE_INDEX
    weight = np.ones((B, L - 1), dtype=np.float32)
    weight[0, 5:8] = 3.0

    # torch oracle (trainers.py:128-137)
    t_labels = torch.tensor(labels)
    t_mask = (t_labels[:, 1:] != IGNORE_INDEX).float()
    t_wm = torch.tensor(weight) * t_mask
    t_logp = (torch.tensor(per_token) * t_wm).sum(-1)
    if use_average:
        t_logp = t_logp / t_wm.sum(-1)

    ours = compute_weighted_logp(
        jnp.asarray(per_token), jnp.asarray(labels), jnp.asarray(weight), use_average
    )
    np.testing.assert_allclose(np.asarray(ours), t_logp.numpy(), atol=1e-5)
