"""Iterative RLAIF-V alignment driver (the reference's x4 protocol, codified).

The reference runs its iterations by hand: generate preference data with the
current policy, train DPO, score every saved checkpoint on Object HalBench,
and use "the best-performing checkpoint as the base model of the next
training iteration" (ref README.md:205-221; checkpoint fan-out in
script/eval/eval_rlaifv_objhal.sh:36-45). This module is that loop as ONE
resumable program:

  for it in 1..N:
    (1) data pipeline with the CURRENT policy     scripts/run_data_pipeline.py
    (2) ref-logp precompute (frozen current policy), parquet cache contract
        (skip-if-exists, like muffin/data/datasets.py:35-48)
    (3) DPO training (checkpoints every save_steps)
    (4) eval answers per checkpoint -> score_answers -> pick the best
    (5) promote the best checkpoint's params as the next iteration's policy

Every stage is resume-by-file: a finished iteration leaves summary.json and
is skipped on re-run (its promoted params restored from the recorded best
checkpoint), mirroring the reference's rerun-a-chunk operational model.

Components are injected (generator factory, labeler, fact backends, scorer)
so the driver is model-family agnostic and testable with tiny models — the
same composition style as run_data_pipeline.run_pipeline.
"""
from __future__ import annotations

import glob
import json
import os
import sys
from typing import Callable, List, Sequence

sys.path.insert(0, os.path.dirname(__file__))

from run_data_pipeline import run_pipeline  # noqa: E402

from rlaifv_tpu.utils.file_io import read_jsonlines, write_json  # noqa: E402


def pairs_to_train_rows(pairs: Sequence[dict]) -> List[dict]:
    """Balanced-pair jsonl rows -> RLAIFVDataset parquet schema rows
    (question/chosen/rejected/image{bytes,path}/idx/origin_*,
    ref muffin/data/datasets.py:74-91). Images are reloaded from
    image_path, as the reference's training stage does."""
    rows = []
    for i, p in enumerate(pairs):
        with open(p["image_path"], "rb") as f:
            img_bytes = f.read()
        rows.append({
            "idx": str(p.get("idx", i)),
            "question": p["question"],
            "chosen": p["chosen"],
            "rejected": p["rejected"],
            "image": {"bytes": img_bytes, "path": p["image_path"]},
            "image_path": p["image_path"],
            "origin_dataset": p.get("origin_dataset", "rlaifv-iter"),
            "origin_split": p.get("origin_split", "{}"),
        })
    return rows


def _has_logp_parquet(cache_dir: str) -> bool:
    return bool(glob.glob(os.path.join(cache_dir, "*logp*.parquet")))


def train_iteration(
    config,
    model,
    params,
    tokenizer,
    image_processor,
    pairs_path: str,
    iter_dir: str,
    *,
    max_len: int,
    num_patches: int,
    batch_pairs: int = 2,
):
    """Stages (2)+(3) for one iteration: frozen-policy ref-logp parquet
    (reused if present) then DPO training from it. Returns the trainer
    (checkpoints + final state live on it)."""
    import copy

    import jax
    import jax.numpy as jnp

    from rlaifv_tpu.data.collator import DPOCollator
    from rlaifv_tpu.data.datasets import DPODataset
    from rlaifv_tpu.train.ref_logp import inference_logp
    from rlaifv_tpu.train.trainer import DPOTrainer

    cache_dir = os.path.join(iter_dir, "logp_cache")
    os.makedirs(cache_dir, exist_ok=True)
    if not _has_logp_parquet(cache_dir):
        rows = pairs_to_train_rows(read_jsonlines(pairs_path))
        inference_logp(
            rows, model, params, tokenizer, cache_dir,
            max_len=max_len, num_patches=num_patches,
            batch_pairs=batch_pairs, image_processor=image_processor,
        )
    else:
        print(f"[iterate] reuse logp cache {cache_dir}", flush=True)

    mm_cfg = {
        "is_multimodal": True,
        "image_processor": image_processor,
        "image_token_len": num_patches,
        "use_im_start_end": False,
    }
    dataset = DPODataset(tokenizer, cache_dir, mm_cfg)
    collator = DPOCollator(
        pad_token_id=tokenizer.pad_token_id or 0,
        max_len=max_len, num_patches=num_patches,
    )
    cfg = copy.deepcopy(config)
    cfg.training.output_dir = os.path.join(iter_dir, "train")
    # params are donated into the trainer; hand it fresh buffers so the
    # caller's tree (this iteration's policy) stays alive for eval reuse.
    fresh = jax.tree.map(lambda x: jnp.array(x), params)
    trainer = DPOTrainer(cfg, model, fresh, dataset, collator)
    trainer.train()
    return trainer


def select_best_checkpoint(
    trainer,
    make_generator: Callable,
    eval_rows: Sequence[dict],
    score_answers: Callable[[List[dict]], float],
    *,
    num_beams: int = 1,
    max_new_tokens: int = 64,
    batch_size: int = 8,
):
    """Stage (4): restore every saved checkpoint, generate eval answers,
    score (LOWER is better — CHAIRs-style), return (best_step, best_params,
    scores). Ties break toward the later step (more training)."""
    import jax

    from rlaifv_tpu.evals.vqa import generate_answers

    template = jax.device_get(trainer._state_tree())
    scores = {}
    best = (None, None, float("inf"))
    for step in trainer.ckpt.all_steps():
        state = trainer.ckpt.restore(template, step)
        gen = make_generator(state["params"])
        answers = generate_answers(
            gen, list(eval_rows), num_beams=num_beams,
            max_new_tokens=max_new_tokens, batch_size=batch_size,
            model_id=f"step-{step}",
        )
        s = float(score_answers(answers))
        scores[step] = s
        print(f"[iterate] checkpoint {step}: score={s:.4f}", flush=True)
        if s <= best[2]:
            best = (step, state["params"], s)
    assert best[0] is not None, "no checkpoints were saved during training"
    return best[0], best[1], scores


def run_iterative_alignment(
    config,
    model,
    params,
    tokenizer,
    image_processor,
    make_generator: Callable,  # (params) -> generator (policy role)
    divide_backend,
    changeq_backend,
    ques_path: str,
    eval_rows: Sequence[dict],
    score_answers: Callable[[List[dict]], float],
    work_dir: str,
    *,
    labeler=None,  # fixed labeler generator; None = the current policy labels
    iterations: int = 4,
    max_len: int = 2048,
    num_patches: int = 576,
    sample_num: int = 2,
    repeat: int = 10,
    batch_size: int = 8,
    max_tokens: int = 512,
    eval_num_beams: int = 1,
    eval_max_new_tokens: int = 64,
):
    """The full x`iterations` loop. Returns (final_params, history)."""
    history = []
    for it in range(1, iterations + 1):
        iter_dir = os.path.join(work_dir, f"iter{it}")
        os.makedirs(iter_dir, exist_ok=True)
        summary_path = os.path.join(iter_dir, "summary.json")

        if os.path.exists(summary_path):
            # finished iteration: restore its promoted params and move on
            with open(summary_path) as f:
                summary = json.load(f)
            from rlaifv_tpu.core.checkpoint import CheckpointManager

            mgr = CheckpointManager(
                os.path.join(iter_dir, "train", "checkpoints")
            )
            params = _restore_params_only(mgr, summary["best_step"])
            mgr.close()
            history.append(summary)
            print(f"[iterate] iter{it} already done "
                  f"(best step {summary['best_step']}) — skipping", flush=True)
            continue

        policy = make_generator(params)
        pairs_path = run_pipeline(
            policy, labeler or policy, divide_backend, changeq_backend,
            ques_path, os.path.join(iter_dir, "results"),
            sample_num=sample_num, repeat=repeat, batch_size=batch_size,
            max_tokens=max_tokens,
        )

        trainer = train_iteration(
            config, model, params, tokenizer, image_processor,
            pairs_path, iter_dir,
            max_len=max_len, num_patches=num_patches,
        )

        best_step, best_params, scores = select_best_checkpoint(
            trainer, make_generator, eval_rows, score_answers,
            num_beams=eval_num_beams, max_new_tokens=eval_max_new_tokens,
            batch_size=batch_size,
        )
        trainer.ckpt.close()
        params = best_params

        summary = {
            "iteration": it,
            "pairs_path": pairs_path,
            "n_pairs": len(read_jsonlines(pairs_path)),
            "best_step": best_step,
            "scores": {str(k): v for k, v in scores.items()},
        }
        write_json(summary_path, summary)
        history.append(summary)
        print(f"[iterate] iter{it} done: best step {best_step} "
              f"score {scores[best_step]:.4f}", flush=True)

    return params, history


def _restore_params_only(mgr, step: int):
    """Restore just the params leaf-tree of a saved DPOTrainState at `step`.
    A template-free restore returns the raw saved pytree (dict-shaped), so
    the optimizer state needn't be reconstructed to promote a policy."""
    restored = mgr._mgr.restore(step)
    if isinstance(restored, dict) and "params" in restored:
        return restored["params"]
    return restored.params
