"""pjit DPO train step: fused concatenated forward-backward over the mesh.

Rebuild of the reference training hot loop
(ref: muffin/train/trainers.py:281-311 `compute_loss` + :161-275
`get_beta_and_logps`) as a single jitted function:

  policy (win‖rej) logps  ->  DPO loss vs cached reference logps  ->  grads
  ->  optax update,  all under GSPMD sharding (params over fsdp, batch over
  dp×fsdp), replacing HF Trainer + DeepSpeed ZeRO.

TPU-first improvements over the reference:
- the vision tower runs ONCE per image (B), features are tiled to the
  concatenated 2B batch; the reference encodes the duplicated image tensor
  twice (trainers.py:188 `torch.cat([images, images])`).
- one fused fwd-bwd over win‖rej (the reference pays two forwards in the
  ref-scoring path and Python-side splits).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from rlaifv_tpu.train.dpo import (
    compute_weighted_logp,
    dpo_loss,
    dpo_metrics,
    get_batch_logps,
    get_batch_logps_compact,
    get_batch_logps_from_hidden,
)

Tree = Any


def _as_variables(params):
    """Accept a bare params tree OR a dict of flax collections
    ({'params': base, 'lora': adapters} — the no-merge LoRA path). A real
    params tree's top-level keys are module names ('llm', 'vision_tower',
    ...), never 'params', so the sniff is unambiguous."""
    if (isinstance(params, dict) and "params" in params
            and set(params) <= {"params", "lora"}):
        return params
    return {"params": params}


def _base_params(params):
    v = _as_variables(params)
    return v["params"]


class LlavaDPOAdapter:
    """Functional facade over LlavaForCausalLM for the train step."""

    def __init__(self, module):
        self.module = module

    def encode_images_fn(self, params, images):
        return self.module.apply(
            _as_variables(params), images, method=self.module.encode_images
        )

    def forward_with_features(self, params, input_ids, feats, starts, mask):
        return self.module.apply(
            _as_variables(params), input_ids, feats, starts, mask,
            method=self.module.forward_with_features,
        )

    def forward_text(self, params, input_ids, mask):
        return self.module.apply(
            _as_variables(params), input_ids, mask,
            method=self.module.forward_text,
        )

    def hidden_with_features(self, params, input_ids, feats, starts, mask):
        return self.module.apply(
            _as_variables(params), input_ids, feats, starts, mask,
            method=self.module.hidden_with_features,
        )

    def hidden_text(self, params, input_ids, mask):
        return self.module.apply(
            _as_variables(params), input_ids, mask,
            method=self.module.hidden_text,
        )

    def lm_head_kernel(self, params):
        """(H, V) head weight for the fused-head logp path (the head is
        excluded from LoRA, ref find_all_linear_names)."""
        llm = _base_params(params)["llm"]
        if "lm_head" in llm:
            return llm["lm_head"]["kernel"]
        return llm["model"]["tok_embed"]["embedding"].T  # tied embeddings


@dataclasses.dataclass(frozen=True)
class DPOHparams:
    beta: float = 0.1  # ref: script/train/llava15_train.sh:48
    dpo_use_average: bool = False
    dpo_token_weighted: bool = False
    sft_weight: float = 0.0  # ref env SFT_weight (trainers.py:299)
    dpo_weight: float = 1.0  # ref env DPO_weight (trainers.py:300)
    logp_shift: bool = True  # False for the MiniCPM label alignment
    # "xla": model returns logits, logp math in jnp (fastest when the head is
    # a large FLOP fraction — small models). "fused": pre-head hiddens + the
    # Pallas fused head (ops/fused_head.py) — the (2B, L, V) logits never
    # exist; ~2% extra FLOPs at 7B for a multi-GB activation saving.
    # "compact": the head runs only on the <= compact_len label positions
    # that carry loss (answers + eos) — head FLOPs and vocab traffic drop
    # by L/compact_len, numerically identical (see get_batch_logps_compact).
    lm_head_impl: str = "xla"
    compact_len: int = 0  # static per-row bound on loss positions ("compact")


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DPOTrainState:
    step: jax.Array
    params: Tree
    opt_state: Tree

    def tree_flatten(self):
        return (self.step, self.params, self.opt_state), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def dpo_forward_logps(
    model,
    params: Tree,
    batch: Dict[str, jax.Array],
    hp: DPOHparams,
) -> Tuple[jax.Array, jax.Array, Dict[str, jax.Array]]:
    """Policy win/rej sequence logps from one concatenated forward.

    batch layout (fixed shapes, win rows then rej rows):
      input_ids (2B, L) pre-expanded; labels (2B, L); attention_mask (2B, L)
      images (B, Hi, Wi, 3) or None; image_starts (2B,)
      win_token_weight/rej_token_weight (B, L-1) when token-weighted
    """
    input_ids = batch["input_ids"]
    labels = batch["labels"]
    twoB = input_ids.shape[0]
    B = twoB // 2

    fused = hp.lm_head_impl == "fused"
    compact = hp.lm_head_impl == "compact"
    if compact and hp.compact_len <= 0:
        raise ValueError("lm_head_impl='compact' requires compact_len > 0")
    use_hidden = fused or compact
    fwd_feats = (
        model.hidden_with_features if use_hidden else model.forward_with_features
    )
    fwd_text = model.hidden_text if use_hidden else model.forward_text

    images = batch.get("images")
    if "win_images" in batch:
        # KTO task: win/rej rows carry different images
        # (ref trainers.py:193-196 torch.cat([win_images, rej_images]))
        both = jnp.concatenate([batch["win_images"], batch["rej_images"]], 0)
        feats2 = model.encode_images_fn(params, both)
        out = fwd_feats(
            params,
            input_ids,
            feats2,
            batch["image_starts"],
            batch["attention_mask"],
        )
    elif images is not None:
        feats = model.encode_images_fn(params, images)  # (B, P, D)
        feats2 = jnp.concatenate([feats, feats], axis=0)
        out = fwd_feats(
            params,
            input_ids,
            feats2,
            batch["image_starts"],
            batch["attention_mask"],
        )
    else:
        out = fwd_text(params, input_ids, batch["attention_mask"])

    aux: Dict[str, jax.Array] = {}
    if compact:
        lp = get_batch_logps_compact(
            out, model.lm_head_kernel(params), labels,
            n_pos=hp.compact_len, shift=hp.logp_shift,
        )
        aux["compact_overflow"] = lp.overflow.max()
    elif fused:
        lp = get_batch_logps_from_hidden(
            out, model.lm_head_kernel(params), labels, shift=hp.logp_shift
        )
    else:
        lp = get_batch_logps(out, labels, shift=hp.logp_shift)

    if hp.dpo_token_weighted:
        token_weight = jnp.concatenate(
            [batch["win_token_weight"], batch["rej_token_weight"]], axis=0
        )
        if compact:
            # Gather the weights onto the same compact slots; masked slots
            # carry 0 in per_token, so sums match compute_weighted_logp.
            ctw = jnp.take_along_axis(token_weight, lp.pos, axis=-1) * lp.mask
            seq_logp = (lp.per_token * ctw).sum(axis=-1)
            if hp.dpo_use_average:
                seq_logp = seq_logp / ctw.sum(axis=-1)
        else:
            seq_logp = compute_weighted_logp(
                lp.per_token, labels, token_weight, hp.dpo_use_average
            )
    else:
        seq_logp = lp.mean if hp.dpo_use_average else lp.sum

    policy_win_logp = seq_logp[:B]
    policy_rej_logp = seq_logp[B:]
    aux["per_token"] = lp.per_token
    return policy_win_logp, policy_rej_logp, aux


def dpo_loss_from_batch(
    model, params: Tree, batch: Dict[str, jax.Array], hp: DPOHparams
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    policy_win_logp, policy_rej_logp, aux = dpo_forward_logps(model, params, batch, hp)

    if hp.dpo_token_weighted:
        ref_win_logp = compute_weighted_logp(
            batch["ref_win_per_token_logp"],
            batch["win_labels"],
            batch["win_token_weight"],
            hp.dpo_use_average,
        )
        ref_rej_logp = compute_weighted_logp(
            batch["ref_rej_per_token_logp"],
            batch["rej_labels"],
            batch["rej_token_weight"],
            hp.dpo_use_average,
        )
    elif hp.dpo_use_average:
        ref_win_logp = batch["ref_win_avg_logp"]
        ref_rej_logp = batch["ref_rej_avg_logp"]
    else:
        ref_win_logp = batch["ref_win_logp"]
        ref_rej_logp = batch["ref_rej_logp"]

    losses, chosen_rewards, rejected_rewards = dpo_loss(
        policy_win_logp, policy_rej_logp, ref_win_logp, ref_rej_logp, hp.beta
    )
    # ref: trainers.py:299-301
    loss = hp.dpo_weight * losses.mean() - hp.sft_weight * policy_win_logp.mean()

    metrics = dpo_metrics(
        "train", chosen_rewards, rejected_rewards,
        policy_win_logp, policy_rej_logp, ref_win_logp, ref_rej_logp,
    )
    metrics["loss"] = loss
    if "compact_overflow" in aux:
        # >0 means compact_len undercounts a row's loss positions (dropped
        # tokens) — surfaced every step so the misconfiguration is visible.
        metrics["compact_overflow"] = aux["compact_overflow"]
    return loss, metrics


def make_optimizer(
    learning_rate: float,
    *,
    total_steps: int,
    warmup_ratio: float = 0.05,  # ref llava15_train.sh:33
    weight_decay: float = 0.01,  # ref llava15_train.sh:32
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    max_grad_norm: float = 1.0,
    schedule: str = "cosine",  # ref llava15_train.sh:34
) -> optax.GradientTransformation:
    warmup = int(total_steps * warmup_ratio)
    if schedule == "cosine":
        lr = optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, warmup, max(total_steps, warmup + 1), 0.0
        )
    elif schedule == "constant":
        lr = optax.join_schedules(
            [optax.linear_schedule(0.0, learning_rate, warmup),
             optax.constant_schedule(learning_rate)],
            [warmup],
        )
    else:
        raise ValueError(schedule)

    def wd_mask(params):
        # HF Trainer convention: no decay on biases / norm scales.
        def one(key_path, _):
            last = str(key_path[-1].key) if hasattr(key_path[-1], "key") else ""
            return last not in ("bias", "scale")

        return jax.tree_util.tree_map_with_path(one, params)

    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(lr, b1=b1, b2=b2, eps=eps,
                    weight_decay=weight_decay, mask=wd_mask),
    )


def make_dpo_train_step(
    model, optimizer: optax.GradientTransformation, hp: DPOHparams
) -> Callable:
    """Returns train_step(state, batch) -> (state, metrics); jit with
    shardings applied by the caller (core/trainer wires the mesh)."""

    def train_step(state: DPOTrainState, batch: Dict[str, jax.Array]):
        grad_fn = jax.value_and_grad(
            lambda p: dpo_loss_from_batch(model, p, batch, hp), has_aux=True
        )
        (loss, metrics), grads = grad_fn(state.params)
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return (
            DPOTrainState(state.step + 1, new_params, new_opt_state),
            metrics,
        )

    return train_step


def make_lora_dpo_train_step(
    model,
    optimizer: optax.GradientTransformation,
    hp: DPOHparams,
    *,
    lora_alpha: float = 16.0,
) -> Callable:
    """LoRA variant: state.params is the adapter tree; frozen base params are
    a separate argument (ref: muffin/train/train_llava15_lora.py — peft
    adapters trained, base frozen). Adapters apply per-layer through the
    'lora' variable collection (models.llama.LoraDense) instead of
    materializing a merged param tree — same math (lora_scaled folds alpha/r
    into b), but the base is never duplicated, which is what lets 7B LoRA
    DPO fit one 16G chip."""
    from rlaifv_tpu.train.lora import lora_scaled

    def train_step(
        state: DPOTrainState, base_params, batch: Dict[str, jax.Array]
    ):
        def loss_fn(lora):
            variables = {
                "params": jax.lax.stop_gradient(base_params),
                "lora": lora_scaled(lora, alpha=lora_alpha),
            }
            return dpo_loss_from_batch(model, variables, batch, hp)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        new_lora = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return DPOTrainState(state.step + 1, new_lora, new_opt_state), metrics

    return train_step
