"""Training loop: epochs over the preference dataset, jitted step, orbax
checkpoints, metric logging.

Replaces HF Trainer + DeepSpeed (ref: muffin/train/train_llava15.py:293-334
`train()`; checkpoint cadence llava15_train.sh:26-27; auto-resume
train_llava15.py:326-331). The loop is host-side Python; everything per-step
runs in one compiled program on the mesh.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rlaifv_tpu.core.checkpoint import CheckpointManager, has_resumable_checkpoint
from rlaifv_tpu.core.config import Config
from rlaifv_tpu.parallel.sharding import create_mesh, shard_batch, shard_params
from rlaifv_tpu.train.train_step import (
    DPOHparams,
    DPOTrainState,
    LlavaDPOAdapter,
    make_dpo_train_step,
    make_lora_dpo_train_step,
    make_optimizer,
)
from rlaifv_tpu.utils.prefetch import prefetch_iterator


class MetricLogger:
    """JSONL metrics sink (stdout + file); wandb-compatible dict shape."""

    def __init__(self, output_dir: str, also_print: bool = True):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, "metrics.jsonl")
        self.also_print = also_print
        self._f = open(self.path, "a")

    def log(self, step: int, metrics: Dict):
        rec = {"step": step}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                pass
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self.also_print:
            brief = {k: round(v, 4) for k, v in rec.items()
                     if k in ("step", "loss", "rewards_train/accuracies",
                              "grad_norm")}
            print(f"[train] {brief}", flush=True)


class DPOTrainer:
    def __init__(
        self,
        config: Config,
        model,  # LlavaForCausalLM-like module
        params,  # OWNERSHIP TRANSFERS: buffers are donated into the step
        dataset,  # indexable -> (rej_dict, win_dict)
        collator,  # DPOCollator
        *,
        mesh=None,
        base_params=None,  # set when LoRA: params is the adapter tree
        lora_alpha: float = 16.0,
        adapter=None,  # family facade; default LlavaDPOAdapter (family.py)
    ):
        t = config.training
        self.config = config
        self.dataset = dataset
        self.collator = collator
        self.adapter = adapter or LlavaDPOAdapter(model)
        self.use_lora = base_params is not None

        self.mesh = mesh or create_mesh(
            dp=t.mesh_dp, fsdp=t.mesh_fsdp, tp=t.mesh_tp
        )
        head = getattr(t, "lm_head_impl", "auto")
        compact_len = int(getattr(t, "compact_len", 0))
        if head == "auto":
            if compact_len > 0:
                # compact head: strictly less head work at any scale, as long
                # as the caller can bound loss positions per row (PARITY).
                head = "compact"
            else:
                # fused head trades ~2 extra head matmuls for never
                # materializing the (2B, L, V) logits — a win once the head
                # is a small FLOP fraction (7B+); measured slower at sub-1B
                # proxy scale (PARITY).
                hidden = model.cfg.llm.hidden_size
                head = "fused" if hidden >= 2048 else "xla"
        hp = DPOHparams(
            beta=t.dpo_beta,
            dpo_use_average=t.dpo_use_average,
            dpo_token_weighted=t.dpo_token_weighted,
            sft_weight=t.sft_weight,
            dpo_weight=t.dpo_weight,
            lm_head_impl=head,
            compact_len=compact_len,
            shared_prefix_len=int(getattr(t, "shared_prefix_len", 0)),
            shared_suffix_len=int(getattr(t, "shared_suffix_len", 0)),
        )
        # -1 = derive P from data; remembered so a later batch with a
        # SHORTER common prefix re-derives instead of hard-failing (an
        # explicitly configured P keeps the hard-fail contract)
        self._auto_prefix = hp.shared_prefix_len < 0
        self._num_patches = getattr(
            getattr(model, "cfg", None), "num_image_tokens", 0
        ) or 0
        self.optimizer = make_optimizer(
            t.learning_rate,
            total_steps=t.max_steps,
            warmup_ratio=t.warmup_ratio,
            weight_decay=t.weight_decay,
            max_grad_norm=t.max_grad_norm,
            schedule=t.lr_schedule,
        )
        self.grad_accum = max(int(getattr(t, "gradient_accumulation", 1)), 1)
        if self.grad_accum > 1:
            # ref HF Trainer gradient_accumulation_steps: k micro-batches
            # average into one optimizer update; max_steps still counts
            # optimizer updates (the lr schedule sees applies, as optax
            # MultiSteps only advances the inner transform on the k-th call).
            self.optimizer = optax.MultiSteps(
                self.optimizer, every_k_schedule=self.grad_accum
            )
        with self.mesh:
            if self.use_lora:
                self.base_params = shard_params(base_params, self.mesh)
                train_params = jax.device_put(params)
            else:
                self.base_params = None
                train_params = shard_params(params, self.mesh)
            self.state = DPOTrainState(
                jnp.int32(0), train_params, self.optimizer.init(train_params)
            )

        self._lora_alpha = lora_alpha
        self._build_step(hp)

        self.logger = MetricLogger(t.output_dir)
        self.ckpt = CheckpointManager(
            os.path.join(t.output_dir, "checkpoints"), t.save_total_limit
        )
        self.start_step = 0
        if has_resumable_checkpoint(self.ckpt.directory):
            template = self._state_tree()
            restored = self.ckpt.restore(template)
            from jax.sharding import NamedSharding, PartitionSpec

            rep = NamedSharding(self.mesh, PartitionSpec())

            def place(t, r):
                # pin every restored leaf to the template's mesh sharding;
                # anything without one (host scalars) is mesh-replicated
                sh = getattr(t, "sharding", None)
                if not isinstance(sh, NamedSharding):
                    sh = rep
                return jax.device_put(jnp.asarray(r), sh)

            restored = jax.tree.map(place, template, restored)
            self.state = DPOTrainState(
                restored["step"], restored["params"], restored["opt_state"]
            )
            self.start_step = int(self.state.step)
            print(f"[train] resumed from step {self.start_step}", flush=True)

    def _state_tree(self):
        # orbax-friendly plain-dict view of the train state
        return {
            "step": self.state.step,
            "params": self.state.params,
            "opt_state": self.state.opt_state,
        }

    # ----------------------------------------------------------- data

    def _batches(self, seed: int) -> Iterator:
        t = self.config.training
        n_pairs = t.per_device_batch_pairs * (
            self.mesh.shape["dp"] * self.mesh.shape["fsdp"]
        )
        rng = np.random.default_rng(seed)
        order = rng.permutation(len(self.dataset))
        pos = 0
        while True:
            if pos + n_pairs > len(order):
                order = rng.permutation(len(self.dataset))
                pos = 0
            idx = order[pos : pos + n_pairs]
            pos += n_pairs
            yield self.collator([self.dataset[int(i)] for i in idx])

    # ----------------------------------------------------------- loop

    def _check_overflow(self, step: int, overflow) -> None:
        """Hard-fail when the compact head dropped loss tokens.

        Silently-dropped tokens corrupt the DPO logps; ref_logp.py hard-fails
        on the same condition, and the trainer must too (a training run with
        an undersized compact_len is wrong, not just slow).
        """
        n = int(overflow)
        if n > 0:
            raise ValueError(
                f"compact head overflow at step {step}: a row has "
                f"{self.hp.compact_len + n} loss positions but compact_len="
                f"{self.hp.compact_len}; raise training.compact_len or set "
                f"training.lm_head_impl='xla'/'fused'"
            )

    def _build_step(self, hp) -> None:
        self.hp = hp
        if self.use_lora:
            step = make_lora_dpo_train_step(
                self.adapter, self.optimizer, hp,
                lora_alpha=self._lora_alpha,
            )
        else:
            step = make_dpo_train_step(self.adapter, self.optimizer, hp)
        self._step = jax.jit(step, donate_argnums=0)

    def train(self) -> DPOTrainState:
        t = self.config.training
        from rlaifv_tpu.core.distributed import assert_consistent

        # multi-host debug guard (RLAIFV_DISTRIBUTED_DEBUG=1): divergent
        # host-side config/seed silently corrupts SPMD training
        assert_consistent(
            {"seed": t.seed, "max_steps": t.max_steps,
             "lr": t.learning_rate, "beta": t.dpo_beta,
             "accum": self.grad_accum},
            "training-config",
        )
        batches = prefetch_iterator(self._batches(t.seed), depth=2)
        step = self.start_step
        t0 = time.time()
        micro_total = t.max_steps * self.grad_accum
        # (step_no, device scalar) from the previous step: checked one step
        # late so the fetch never blocks on in-flight work (the prior step is
        # already complete once the next one is dispatched).
        pending_overflow = None
        with self.mesh:
            for batch in batches:
                if step >= micro_total:
                    break
                if pending_overflow is not None:
                    self._check_overflow(*pending_overflow)
                if self.hp.shared_prefix_len < 0:
                    # shared_prefix_len=-1: derive a safe static P from the
                    # first batch (image-end rule — see
                    # derive_shared_prefix_len) and rebuild the step once.
                    # 0 = no paired speedup expressible -> plain path.
                    from rlaifv_tpu.train.train_step import (
                        derive_shared_prefix_len,
                    )
                    import dataclasses as _dc

                    P = derive_shared_prefix_len(batch, self._num_patches)
                    self.logger.log(
                        step, {"derived_shared_prefix_len": P}
                    )
                    self._build_step(
                        _dc.replace(self.hp, shared_prefix_len=P)
                    )
                if self.hp.shared_prefix_len > 0:
                    # exactness guard for the paired forward: cheap numpy
                    # equality on the host batch (see validate_shared_prefix)
                    from rlaifv_tpu.train.train_step import (
                        validate_shared_prefix,
                    )

                    try:
                        validate_shared_prefix(
                            batch, self.hp.shared_prefix_len,
                            self._num_patches,
                            suffix_len=self.hp.shared_suffix_len,
                        )
                    except ValueError:
                        if not self._auto_prefix:
                            raise  # explicit config P: wrong data, not ours
                        # derived-P mode: this batch's common prefix is
                        # shorter than the first batch's — re-derive and
                        # rebuild (exact; one recompile), or fall back to
                        # the plain path at P=0, instead of killing a long
                        # run mid-flight
                        from rlaifv_tpu.train.train_step import (
                            derive_shared_prefix_len,
                        )
                        import dataclasses as _dc
                        import warnings as _w

                        P = derive_shared_prefix_len(
                            batch, self._num_patches
                        )
                        _w.warn(
                            f"batch at step {step} breaks the derived "
                            f"shared prefix P={self.hp.shared_prefix_len}; "
                            f"re-deriving P={P} "
                            + ("(plain path)" if P == 0 else "(rebuilt)"),
                            stacklevel=2,
                        )
                        self.logger.log(
                            step, {"derived_shared_prefix_len": P}
                        )
                        self._build_step(
                            _dc.replace(self.hp, shared_prefix_len=P)
                        )
                        if P > 0:
                            validate_shared_prefix(
                                batch, P, self._num_patches,
                                suffix_len=self.hp.shared_suffix_len,
                            )
                sb = shard_batch(batch, self.mesh)
                if self.use_lora:
                    self.state, metrics = self._step(
                        self.state, self.base_params, sb
                    )
                else:
                    self.state, metrics = self._step(self.state, sb)
                step += 1
                if "compact_overflow" in metrics:
                    pending_overflow = (step, metrics["compact_overflow"])
                if step % t.logging_steps == 0:
                    m = jax.device_get(metrics)
                    # NaN tripwire (ref trainers.py:263-271 prints + exits;
                    # here: stop cleanly with the offending metrics logged)
                    if not np.isfinite(m.get("loss", 0.0)):
                        self.logger.log(step, m)
                        raise FloatingPointError(
                            f"non-finite loss at step {step}: {m.get('loss')}"
                        )
                    m["steps_per_sec"] = t.logging_steps / max(
                        time.time() - t0, 1e-9
                    )
                    t0 = time.time()
                    self.logger.log(step, m)
                if step % t.save_steps == 0:
                    self.ckpt.save(step, jax.device_get(self._state_tree()))
            if pending_overflow is not None:
                self._check_overflow(*pending_overflow)
        if self.ckpt.latest_step() != step:
            self.ckpt.save(step, jax.device_get(self._state_tree()), force=True)
        self.ckpt.wait()
        return self.state
