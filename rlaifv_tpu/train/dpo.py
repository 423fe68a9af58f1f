"""DPO loss and batch log-probability math, as pure jnp.

TPU-native rebuild of the reference loss core
(ref: muffin/train/trainers.py:91-137 `dpo_loss`/`compute_weighted_logp`;
muffin/eval/muffin_inference_logp.py:82-115 `get_batch_logps` and :21-52
`get_batch_logps_minicpm`). These functions are the parity gate for the
whole training stack: they must be numerically faithful to the torch
reference on identical logits/labels (see tests/test_dpo_math.py).

Design notes (TPU):
- log_softmax + gather runs in fp32 regardless of activation dtype; the
  gather is expressed with take_along_axis which XLA lowers to an efficient
  one-hot contraction on the MXU for small vocab tiles, or a dynamic-gather.
- everything is shape-static and mask-based: the -100 ignore positions are
  masked, never dropped, so the same jaxpr serves any batch.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from rlaifv_tpu.constants import IGNORE_INDEX


class BatchLogps(NamedTuple):
    per_token: jax.Array  # (B, L-1) log p of each target token (0 at masked)
    sum: jax.Array  # (B,) masked sum
    mean: jax.Array  # (B,) masked mean


def get_batch_logps(
    logits: jax.Array,
    labels: jax.Array,
    *,
    shift: bool = True,
) -> BatchLogps:
    """Log-probabilities of `labels` under `logits`, ignoring -100 positions.

    With shift=True this matches the standard causal alignment: position t's
    logits predict labels[t+1] (ref get_batch_logps). shift=False matches the
    MiniCPM variant where position ids are pre-aligned and labels[:, :-1] are
    scored by logits[:, :-1] (ref get_batch_logps_minicpm).

    Returns per-token/sum/mean logps; per_token has length L-1 in both modes.
    """
    if shift:
        tgt = labels[:, 1:]
    else:
        tgt = labels[:, :-1]
    lgt = logits[:, :-1, :]

    mask = tgt != IGNORE_INDEX
    safe_tgt = jnp.where(mask, tgt, 0)

    # logp[t] = logit[t] - logsumexp(logits): identical to a log_softmax
    # gather, but never materializes the (B, L, V) fp32 log-prob tensor —
    # the vocab-sized fp32 traffic was ~16% of the DPO step on v5e.
    lse = jax.scipy.special.logsumexp(lgt.astype(jnp.float32), axis=-1)
    tgt_logit = jnp.take_along_axis(lgt, safe_tgt[..., None], axis=-1)[..., 0]
    per_token = (tgt_logit.astype(jnp.float32) - lse) * mask

    total = per_token.sum(axis=-1)
    count = mask.sum(axis=-1)
    mean = total / count
    return BatchLogps(per_token=per_token, sum=total, mean=mean)


def get_batch_logps_from_hidden(
    hidden: jax.Array,
    lm_head_kernel: jax.Array,
    labels: jax.Array,
    *,
    shift: bool = True,
    interpret: Optional[bool] = None,
) -> BatchLogps:
    """get_batch_logps from pre-head hidden states via the fused Pallas head
    (ops/fused_head.py): the (B, L, V) logits are never materialized. Same
    contract/outputs as get_batch_logps(logits, labels).

    interpret=None auto-selects Pallas interpret mode off-TPU (CPU tests and
    the virtual-device mesh run the same code path).
    """
    from rlaifv_tpu.ops.fused_head import fused_target_logp

    if shift:
        tgt = labels[:, 1:]
    else:
        tgt = labels[:, :-1]
    hid = hidden[:, :-1, :]

    mask = tgt != IGNORE_INDEX
    safe_tgt = jnp.where(mask, tgt, 0)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    per_token = fused_target_logp(
        hid, lm_head_kernel, safe_tgt, interpret=interpret
    ) * mask

    total = per_token.sum(axis=-1)
    count = mask.sum(axis=-1)
    mean = total / count
    return BatchLogps(per_token=per_token, sum=total, mean=mean)


class CompactLogps(NamedTuple):
    per_token: jax.Array  # (B, A) log p of each valid target (0 at masked)
    pos: jax.Array  # (B, A) indices into the L-1 target axis
    mask: jax.Array  # (B, A) bool: slot holds a real (non-ignored) target
    sum: jax.Array  # (B,) masked sum
    mean: jax.Array  # (B,) masked mean
    overflow: jax.Array  # (B,) #valid targets that did NOT fit in A (want 0)


def get_batch_logps_compact(
    hidden: jax.Array,
    lm_head_kernel: jax.Array,
    labels: jax.Array,
    *,
    n_pos: int,
    shift: bool = True,
) -> CompactLogps:
    """get_batch_logps computed only at the label positions that matter.

    DPO/SFT losses only read logps where labels != -100 (the answer tokens —
    ref muffin/eval/muffin_inference_logp.py:95-107 masks everything else),
    yet the reference computes the full (B, L, V) logits. On TPU the LM head
    is a large slice of step FLOPs and the dominant vocab-sized HBM traffic,
    so we gather the <= n_pos valid rows of the pre-head hidden states and
    run the head only on those: head FLOPs and fp32 logsumexp traffic drop
    by L/n_pos with bit-identical sums/means (the gathered set contains every
    unmasked position; masked slots contribute exactly 0 in both paths).

    n_pos is a static bound on valid targets per row (answers + eos). Rows
    with more valid targets than n_pos report the excess in `overflow`; the
    caller surfaces it as a metric so a too-small bound is visible, not
    silent.
    """
    if shift:
        tgt = labels[:, 1:]
    else:
        tgt = labels[:, :-1]
    hid = hidden[:, :-1, :]
    n_pos = min(int(n_pos), tgt.shape[1])

    mask = tgt != IGNORE_INDEX  # (B, L-1)
    # Stable argsort on ~mask lists valid positions first, in order.
    pos = jnp.argsort(~mask, axis=-1, stable=True)[:, :n_pos]  # (B, A)
    cmask = jnp.take_along_axis(mask, pos, axis=-1)
    ctgt = jnp.where(cmask, jnp.take_along_axis(tgt, pos, axis=-1), 0)
    chid = jnp.take_along_axis(hid, pos[:, :, None], axis=1)  # (B, A, H)

    logits = chid @ lm_head_kernel.astype(chid.dtype)  # (B, A, V)
    lse = jax.scipy.special.logsumexp(logits.astype(jnp.float32), axis=-1)
    tgt_logit = jnp.take_along_axis(logits, ctgt[..., None], axis=-1)[..., 0]
    per_token = (tgt_logit.astype(jnp.float32) - lse) * cmask

    total = per_token.sum(axis=-1)
    count = cmask.sum(axis=-1)
    mean = total / count
    overflow = jnp.maximum(mask.sum(axis=-1) - n_pos, 0)
    return CompactLogps(per_token, pos, cmask, total, mean, overflow)


def dpo_loss(
    policy_chosen_logps: jax.Array,
    policy_rejected_logps: jax.Array,
    reference_chosen_logps: jax.Array,
    reference_rejected_logps: jax.Array,
    beta: jax.Array,
    reference_free: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-example DPO losses and (stop-gradient) rewards.

    loss = -logsigmoid(beta * ((pi_w - pi_l) - (ref_w - ref_l)))
    (ref: muffin/train/trainers.py:91-126).
    """
    pi_logratios = policy_chosen_logps - policy_rejected_logps
    ref_logratios = reference_chosen_logps - reference_rejected_logps
    if reference_free:
        ref_logratios = jnp.zeros_like(ref_logratios)

    margin = pi_logratios - ref_logratios
    losses = -jax.nn.log_sigmoid(beta * margin)
    chosen_rewards = jax.lax.stop_gradient(
        beta * (policy_chosen_logps - reference_chosen_logps)
    )
    rejected_rewards = jax.lax.stop_gradient(
        beta * (policy_rejected_logps - reference_rejected_logps)
    )
    return losses, chosen_rewards, rejected_rewards


def compute_weighted_logp(
    per_token_logp: jax.Array,
    labels: jax.Array,
    token_weight: jax.Array,
    use_average: bool,
) -> jax.Array:
    """Token-weighted sequence logp (RLHF-V fine-grained weighting).

    per_token_logp: (B, L-1) aligned to labels[:, 1:]
    (ref: muffin/train/trainers.py:128-137).
    """
    loss_mask = (labels[:, 1:] != IGNORE_INDEX).astype(per_token_logp.dtype)
    weighted_mask = token_weight * loss_mask
    logp = (per_token_logp * weighted_mask).sum(axis=-1)
    if use_average:
        return logp / weighted_mask.sum(axis=-1)
    return logp


def dpo_metrics(
    task: str,
    chosen_rewards: jax.Array,
    rejected_rewards: jax.Array,
    policy_win_logp: jax.Array,
    policy_rej_logp: jax.Array,
    ref_win_logp: jax.Array,
    ref_rej_logp: jax.Array,
) -> dict:
    """Scalar metric dict with reference-compatible key names
    (ref: muffin/train/trainers.py:142-158)."""
    acc = (chosen_rewards > rejected_rewards).astype(jnp.float32)
    t = task
    m = {
        f"rewards_{t}/chosen": chosen_rewards.mean(),
        f"rewards_{t}/rejected": rejected_rewards.mean(),
        f"logps_{t}/chosen": policy_win_logp.mean(),
        f"logps_{t}/rejected": policy_rej_logp.mean(),
        f"logps_{t}/ref_chosen": ref_win_logp.mean(),
        f"logps_{t}/ref_rejected": ref_rej_logp.mean(),
        f"rewards_{t}/accuracies": acc.mean(),
    }
    m[f"rewards_{t}/margins"] = m[f"rewards_{t}/chosen"] - m[f"rewards_{t}/rejected"]
    return m
