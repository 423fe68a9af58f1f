"""DPO training entry point.

Equivalent of `deepspeed muffin/train/train_llava15.py` (ref:
muffin/train/train_llava15.py:293-334 + script/train/llava15_train.sh) —
one process per host, GSPMD inside. Two modes:

  python train.py --config cfg.json            # real run from a checkpoint
  python train.py --demo                       # tiny synthetic smoke run

The reference's flow is preserved: load policy -> (missing logp cache?) run
the frozen-reference precompute -> train DPO against cached logps -> save.
"""
from __future__ import annotations

import argparse
import json
import os
import sys


def build_llava(config):
    import jax.numpy as jnp

    from rlaifv_tpu.core.config import resolve_dtype
    from rlaifv_tpu.models.clip_vit import CLIPVisionConfig
    from rlaifv_tpu.models.llama import LlamaConfig
    from rlaifv_tpu.models.llava import LlavaConfig, LlavaForCausalLM

    dtype = resolve_dtype(config.model.dtype)
    pdtype = resolve_dtype(config.model.param_dtype)
    cfg = LlavaConfig(
        llm=LlamaConfig.vicuna_7b(
            dtype=dtype, param_dtype=pdtype, remat=config.model.remat,
            quantize=config.model.quantize, quantize_lm_head=False,
        ),
        vision=CLIPVisionConfig.clip_l_336(dtype=dtype, param_dtype=pdtype),
        projector_type=config.model.mm_projector_type,
    )
    return cfg, LlavaForCausalLM(cfg)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, default=None)
    ap.add_argument("--demo", action="store_true",
                    help="tiny synthetic end-to-end run (no checkpoint needed)")
    ap.add_argument("--output-dir", type=str, default=None)
    ap.add_argument("--max-steps", type=int, default=None)
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE", "/root/.jax_cache"))

    from rlaifv_tpu.core.config import Config

    config = Config.from_json(args.config) if args.config else Config()
    if args.output_dir:
        config.training.output_dir = args.output_dir
    if args.max_steps:
        config.training.max_steps = args.max_steps

    if args.demo:
        return run_demo(config)

    from transformers import AutoTokenizer

    from rlaifv_tpu.data.collator import DPOCollator
    from rlaifv_tpu.data.datasets import DPODataset
    from rlaifv_tpu.data.image_processing import ClipImageProcessor
    from rlaifv_tpu.models.convert import load_llava_checkpoint
    from rlaifv_tpu.train.ref_logp import inference_logp
    from rlaifv_tpu.train.trainer import DPOTrainer

    cfg, model = build_llava(config)
    print(f"[train] loading checkpoint {config.model.model_name_or_path}")
    import numpy as np

    params = load_llava_checkpoint(
        config.model.model_name_or_path,
        dtype=np.float32 if config.model.param_dtype == "float32" else np.dtype("bfloat16")
        if hasattr(np, "bfloat16") else np.float32,
        vision_layers_to_run=cfg.vision.layers_to_run,
    )
    if config.model.quantize:
        from rlaifv_tpu.models.convert import quantize_llm_int8

        assert config.training.use_lora, (
            "model.quantize trains nothing by itself — the int8 base is "
            "frozen; combine with training.use_lora (QLoRA)"
        )
        params["llm"] = quantize_llm_int8(params["llm"], include_lm_head=False)
    tokenizer = AutoTokenizer.from_pretrained(
        config.model.model_name_or_path, use_fast=False
    )
    tokenizer.model_max_length = config.data.max_len
    if tokenizer.pad_token is None:
        tokenizer.pad_token = tokenizer.unk_token

    proc = ClipImageProcessor(image_size=cfg.vision.image_size)
    mm_cfg = {
        "is_multimodal": config.data.is_multimodal,
        "image_processor": proc,
        "image_token_len": cfg.num_image_tokens,
        "use_im_start_end": False,
    }

    def score_fn(data_dir):
        # lazy reference-logp precompute on the frozen starting policy
        import pyarrow.parquet as pq

        raw = [
            f for f in os.listdir(data_dir)
            if f.endswith(".parquet") and "logp" not in f
        ]
        assert raw, f"no raw parquet rows in {data_dir} to score"
        rows = []
        for f in sorted(raw):
            rows.extend(pq.read_table(os.path.join(data_dir, f)).to_pylist())
        head = getattr(config.training, "lm_head_impl", "auto")
        if head == "auto":
            head = "fused" if cfg.llm.hidden_size >= 2048 else "xla"
        inference_logp(
            rows, model, params, tokenizer, data_dir,
            max_len=config.data.max_len, num_patches=cfg.num_image_tokens,
            image_processor=proc,
            # same head impl as the train step: keeps the policy==reference
            # => loss = log 2 cancellation exact
            lm_head_impl=head,
        )

    dataset = DPODataset(tokenizer, config.data.data_dir, mm_cfg,
                         score_fn=score_fn)
    collator = DPOCollator(
        pad_token_id=tokenizer.pad_token_id,
        max_len=config.data.max_len,
        num_patches=cfg.num_image_tokens,
        beta=config.training.dpo_beta,
        mod_token_weight=config.training.dpo_token_weight,
        task=config.training.task,
    )

    if config.training.use_lora:
        from rlaifv_tpu.train.lora import lora_init

        if config.training.lora_dropout:
            # our LoRA folds kernel + a@b per step, so there is no separate
            # adapter branch to drop (ref peft applies dropout to the
            # adapter input; default 0.05 matters little at these scales)
            print("[train] lora_dropout is ignored by the folded-merge "
                  "LoRA design", flush=True)
        lora = lora_init(
            jax.random.PRNGKey(config.training.seed), params,
            r=config.training.lora_r,
        )
        trainer = DPOTrainer(
            config, model, lora, dataset, collator,
            base_params=params, lora_alpha=config.training.lora_alpha,
        )
    else:
        trainer = DPOTrainer(config, model, params, dataset, collator)
    trainer.train()
    print("[train] done")


def run_demo(config):
    import jax

    from rlaifv_tpu.data.collator import DPOCollator
    from rlaifv_tpu.models.llava import LlavaConfig, LlavaForCausalLM
    from rlaifv_tpu.train.trainer import DPOTrainer
    from rlaifv_tpu.utils.synth import synth_preference_pairs

    import jax.numpy as jnp

    cfg = LlavaConfig.tiny()
    model = LlavaForCausalLM(cfg)
    P = cfg.num_image_tokens
    pairs = synth_preference_pairs(cfg, 16, answer_len=12, question_len=8)

    class _DS:
        def __len__(self):
            return len(pairs)

        def __getitem__(self, i):
            return pairs[i]

    params = model.init(
        jax.random.PRNGKey(0),
        jnp.ones((2, P + 8), jnp.int32),
        images=jnp.zeros((2, cfg.vision.image_size, cfg.vision.image_size, 3)),
        image_starts=jnp.asarray([0, 0]),
    )["params"]

    config.training.max_steps = min(config.training.max_steps, 8)
    config.training.learning_rate = 1e-3
    config.training.save_steps = 4
    config.training.mesh_fsdp = 1
    collator = DPOCollator(pad_token_id=0, max_len=48, num_patches=P)
    trainer = DPOTrainer(config, model, params, _DS(), collator)
    state = trainer.train()
    print(f"[demo] finished at step {int(state.step)}")


if __name__ == "__main__":
    main()
