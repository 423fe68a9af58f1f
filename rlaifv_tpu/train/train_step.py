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

# one-shot guard for the KTO/shared-prefix fallback warning (trace-time)
_WARNED_PAIRED_KTO_FALLBACK = False


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

    def embed_ids(self, params, input_ids):
        """Token embeddings only (patch-slot sentinels clamped)."""
        return self.module.apply(
            _as_variables(params), jnp.maximum(input_ids, 0),
            method=lambda m, ids: m.llm.embed(ids),
        )

    def logits_from_hidden(self, params, hidden):
        return self.module.apply(
            _as_variables(params), hidden,
            method=lambda m, h: m.llm.logits(h),
        )

    def splice_features(self, embeds, feats, starts):
        from rlaifv_tpu.models.llava import splice_image_features

        return splice_image_features(embeds, feats, starts)

    def paired_hidden(self, params, prefix_embeds, suffix_embeds,
                      prefix_mask, suffix_mask, suffix_pos_start=None):
        """Shared-prefix paired forward (train/paired_forward.py): the
        prompt prefix runs ONCE per pair, suffixes attend over its KV.
        Returns (prefix_hidden (B, Pa, D), suffix_hidden (2B, W, D))."""
        from rlaifv_tpu.train.paired_forward import PairedLlamaModel

        mod = PairedLlamaModel(self.module.cfg.llm)
        v = _as_variables(params)
        sub = {}
        for col, tree in v.items():
            t = tree["llm"] if "llm" in tree else tree
            sub[col] = t["model"] if "model" in t else t
        return mod.apply(sub, prefix_embeds, suffix_embeds,
                         prefix_mask, suffix_mask,
                         suffix_pos_start=suffix_pos_start)


class OmnilmmDPOAdapter(LlavaDPOAdapter):
    """OmniLMM-12B facade for the same train step (BASELINE config 4).

    The reference's non-LLaVA DPO branch (ref: muffin/train/trainers.py:
    161-275 `get_beta_and_logps(is_llava15=False)` + forward_DPO :66-88)
    runs the identical concatenated win‖rej forward; the only model-side
    difference is where vision lands — OmniLMM's prompt already carries
    literal <im_start><im_patch>*N<im_end> tokens (text expansion,
    omnilmm/train/train_utils.py:161-174) and the EVA02+resampler features
    overwrite that span. Our `splice_image_features` covers both, and
    OmniLMM's llm is the same LlamaForCausalLM module (Mistral geometry),
    so every method — including the shared-prefix `paired_hidden`
    (PairedLlamaModel reads `cfg.llm`) and `lm_head_kernel` (Mistral's head
    is untied) — inherits unchanged. The class exists so call sites name
    the family explicitly and as the anchor for omni-specific divergence.
    """


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
    # > 0: win/rej share the first shared_prefix_len tokens (prompt prefix);
    # the pair's prefix runs ONCE (train/paired_forward.py — per-pair token
    # work P + 2W instead of 2L). The caller must guarantee, per batch:
    # shared_prefix_len <= every pair's common-prefix length, and every
    # image span ends at or before it. Internally the prefix array pads to
    # the next multiple of 128 (masked rows, exact) so every hot shape is
    # flash-block / int8-row-block aligned — unaligned P compiled but cost
    # +5.2G of materialized pad/slice temps at 7B (measured).
    shared_prefix_len: int = 0
    # with shared_prefix_len > 0: carry only the first shared_suffix_len
    # suffix tokens (static; 0 = all L-P). Dropping the tail is EXACT as
    # long as no supervised label lies beyond P+W (causal logps never
    # depend on later tokens; validate_shared_prefix enforces it) — the
    # batch tail past prompt+answer is padding, so W ~ answer length, not
    # L-P. Pick a multiple of 128.
    shared_suffix_len: int = 0


def derive_shared_prefix_len(batch, num_patches: int = 0) -> int:
    """Safe static shared_prefix_len derived from one batch (host, numpy).

    Multimodal batches use the image-end rule: P = max(image_start) +
    num_patches. Under the standard templates the image sits at a fixed
    position (after the system prompt), every pair's common prompt runs
    at least through system + image + question, and the question follows
    the image — so this P is valid for EVERY batch, not just the one
    inspected. Text-only batches (and nonstandard variable image
    positions) fall back to this batch's minimum pair-common prefix —
    a later batch with a shorter prompt hard-fails in
    validate_shared_prefix (loud, not silent).
    Returns 0 when no paired speedup is expressible (e.g. divergence
    before the image ends)."""
    import numpy as np

    ids = np.asarray(batch["input_ids"])
    B, L = ids.shape[0] // 2, ids.shape[1]
    eq = ids[:B] == ids[B:]
    full = eq.all(axis=1)
    common = int(np.where(full, L, np.argmin(eq, axis=1)).min())
    if num_patches and "images" in batch:
        starts = np.asarray(batch["image_starts"])
        real = starts[starts >= 0]
        if real.size:
            P = int(real.max()) + num_patches
            return P if P <= common and 0 < P < L else 0
    return common if 0 < common < L else 0


def validate_shared_prefix(
    batch, P: int, num_patches: int = 0, suffix_len: int = 0
) -> None:
    """Host-side guard for the shared-prefix paired forward (numpy, cheap).

    The paired math is exact iff (a) win row i and rej row i carry identical
    tokens in [0, P), (b) every image span ends at or before P, and (c) with
    suffix trimming, no supervised label lies at or beyond P+suffix_len. A
    batch violating any would train on silently-wrong logps, so callers
    hard-fail (same policy as the compact-head overflow check)."""
    import numpy as np

    from rlaifv_tpu.constants import IGNORE_INDEX

    ids = np.asarray(batch["input_ids"])
    B = ids.shape[0] // 2
    diverge = (ids[:B, :P] != ids[B:, :P]).any(axis=1)
    if diverge.any():
        i = int(np.argmax(diverge))
        j = int(np.argmax(ids[i, :P] != ids[B + i, :P]))
        raise ValueError(
            f"shared_prefix_len={P} but pair {i} diverges at token {j}; "
            f"lower training.shared_prefix_len (or set 0 for the plain path)"
        )
    if num_patches and "images" in batch:
        starts = np.asarray(batch["image_starts"])
        bad = (starts >= 0) & (starts + num_patches > P)
        if bad.any():
            i = int(np.argmax(bad))
            raise ValueError(
                f"shared_prefix_len={P} cuts the image span of row {i} "
                f"(start {int(starts[i])} + {num_patches} patches > {P})"
            )
    if suffix_len > 0 and "labels" in batch:
        labels = np.asarray(batch["labels"])
        if labels.shape[1] > P + suffix_len:
            tail = labels[:, P + suffix_len:] != IGNORE_INDEX
            if tail.any():
                rows = np.where(tail.any(axis=1))[0]
                last = int(np.max(np.where(tail[rows[0]])[0])) + P + suffix_len
                raise ValueError(
                    f"shared_suffix_len={suffix_len} drops supervised labels "
                    f"(row {int(rows[0])} has a label at {last} >= "
                    f"P+W={P + suffix_len}); raise training.shared_suffix_len"
                )


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
    if hp.shared_prefix_len > 0 and "win_images" not in batch:
        # shared-prefix paired forward: prefix (B, P) once per pair,
        # suffixes (2B, W) attend over its KV (train/paired_forward.py).
        # The prefix ARRAY pads to Pa = ceil128(P) with masked rows so
        # every per-layer shape is flash/int8-block aligned (unaligned P
        # costs gigabytes of materialized pad/slice temps at 7B); RoPE
        # stays at real positions and pad rows never reach the loss.
        P = hp.shared_prefix_len
        L = input_ids.shape[1]
        if not 0 < P < L:
            raise ValueError(f"shared_prefix_len {P} outside (0, {L})")
        W = hp.shared_suffix_len or (L - P)
        if not 0 < W <= L - P:
            raise ValueError(
                f"shared_suffix_len {W} outside (0, {L - P}] at P={P}"
            )
        Pa = -(-P // 128) * 128
        pad = Pa - P
        amask = batch["attention_mask"]
        pmask = jnp.pad(amask[:B, :P], ((0, 0), (0, pad)))
        smask = jnp.concatenate(
            [jnp.concatenate([pmask, pmask], 0), amask[:, P:P + W]], axis=1
        )
        from rlaifv_tpu.parallel.sharding import pin_batch_activation

        # model.embed_ids is SPMD-safe under a mesh (iota-embed,
        # models/llama.py::_embed_lookup); the pins keep both streams
        # batch-sharded into the paired blocks
        prefix_embeds = model.embed_ids(
            params, jnp.pad(input_ids[:B, :P], ((0, 0), (0, pad)))
        )
        if images is not None:
            feats = model.encode_images_fn(params, images)  # (B, Pimg, D)
            prefix_embeds = model.splice_features(
                prefix_embeds, feats, batch["image_starts"][:B]
            )
        prefix_embeds = pin_batch_activation(prefix_embeds)
        suffix_embeds = pin_batch_activation(
            model.embed_ids(params, input_ids[:, P:P + W])
        )
        hp_hidden, hs_hidden = model.paired_hidden(
            params, prefix_embeds, suffix_embeds, pmask, smask,
            suffix_pos_start=P,
        )
        from rlaifv_tpu.train.paired_forward import merge_paired_hidden

        out = merge_paired_hidden(hp_hidden, hs_hidden, real_prefix_len=P)
        if not use_hidden:  # "xla": logits from the merged hidden
            out = model.logits_from_hidden(params, out)
        if W < L - P:
            # suffix trim: out covers positions [0, P+W); slice the label
            # arrays to match (exact — validate_shared_prefix guarantees
            # no supervised label lies beyond, and causal logps of kept
            # positions never depend on dropped later tokens)
            labels = labels[:, :P + W]
    elif "win_images" in batch:
        if hp.shared_prefix_len > 0:
            # KTO rows carry per-side images inside the prompt prefix, so
            # the prefix is NOT shared and the paired forward cannot apply.
            # Falling back is correct but must not be silent (the user's
            # shared_prefix_len knob did nothing) — warn once per process.
            global _WARNED_PAIRED_KTO_FALLBACK
            if not _WARNED_PAIRED_KTO_FALLBACK:
                _WARNED_PAIRED_KTO_FALLBACK = True
                import warnings

                warnings.warn(
                    f"shared_prefix_len={hp.shared_prefix_len} is ignored for "
                    "KTO batches (win/rej carry different images, so the "
                    "prompt prefix is not shared); using the plain "
                    "concatenated forward",
                    stacklevel=2,
                )
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
        )[:, :labels.shape[1] - 1]  # (2B, L'-1): match the trimmed labels
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
