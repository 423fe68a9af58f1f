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
            quantize_bits=config.model.quantize_bits,
        ),
        vision=CLIPVisionConfig.clip_l_336(dtype=dtype, param_dtype=pdtype),
        projector_type=config.model.mm_projector_type,
    )
    return cfg, LlavaForCausalLM(cfg)


def build_omnilmm(config):
    """OmniLMM-12B DPO (BASELINE config 4): EVA02-enormous + resampler +
    Mistral-7B decoder (ref: muffin/train/trainers.py:161-275 carries the
    non-LLaVA DPO branch; the 12B RLAIF-V headline model is DPO-trained
    from OmniLMM)."""
    from rlaifv_tpu.core.config import resolve_dtype
    from rlaifv_tpu.models.eva02 import EvaConfig
    from rlaifv_tpu.models.llama import LlamaConfig
    from rlaifv_tpu.models.omnilmm import OmniLMMConfig, OmniLMMForCausalLM

    dtype = resolve_dtype(config.model.dtype)
    pdtype = resolve_dtype(config.model.param_dtype)
    cfg = OmniLMMConfig(
        llm=LlamaConfig.mistral_7b(
            dtype=dtype, param_dtype=pdtype, remat=config.model.remat,
            quantize=config.model.quantize, quantize_lm_head=False,
            quantize_bits=config.model.quantize_bits,
        ),
        vision=EvaConfig.enormous(
            dtype=dtype, param_dtype=pdtype,
            # the frozen tower follows the base bit-width (memory is the
            # binding constraint for 12B QLoRA on one 16G chip)
            quantize=config.model.quantize and config.model.quantize_bits == 4,
            quantize_bits=config.model.quantize_bits,
        ),
        num_query=64,
    )
    return cfg, OmniLMMForCausalLM(cfg)


MODEL_BUILDERS = {"llava15": build_llava, "omnilmm": build_omnilmm}


def load_params(config, cfg):
    """Checkpoint -> param pytree for the configured family (+ optional
    int8 quantization of the frozen LLM base for QLoRA)."""
    import numpy as np

    family = config.model.model_family
    dtype = (np.float32 if config.model.param_dtype == "float32"
             else np.dtype("bfloat16") if hasattr(np, "bfloat16")
             else np.float32)
    if family == "llava15":
        from rlaifv_tpu.models.convert import load_llava_checkpoint

        params = load_llava_checkpoint(
            config.model.model_name_or_path, dtype=dtype,
            vision_layers_to_run=cfg.vision.layers_to_run,
        )
    else:
        from rlaifv_tpu.models.convert import (
            convert_omnilmm,
            load_state_dict_dir,
        )

        params = convert_omnilmm(
            load_state_dict_dir(config.model.model_name_or_path), dtype=dtype
        )
    if config.model.quantize:
        assert config.training.use_lora, (
            "model.quantize trains nothing by itself — the quantized base "
            "is frozen; combine with training.use_lora (QLoRA)"
        )
        if config.model.quantize_bits == 4:
            from rlaifv_tpu.models.convert import (
                quantize_llm_int4,
                quantize_vision_int4,
            )

            params["llm"] = quantize_llm_int4(params["llm"])
            if family != "llava15":
                params["vision_tower"] = quantize_vision_int4(
                    params["vision_tower"]
                )
        else:
            from rlaifv_tpu.models.convert import quantize_llm_int8

            params["llm"] = quantize_llm_int8(params["llm"],
                                              include_lm_head=False)
    return params


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, default=None)
    ap.add_argument("--demo", action="store_true",
                    help="tiny synthetic end-to-end run (no checkpoint needed)")
    ap.add_argument("--family", type=str, default=None,
                    help="override model.model_family (llava15|omnilmm)")
    ap.add_argument("--output-dir", type=str, default=None)
    ap.add_argument("--max-steps", type=int, default=None)
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE", "/root/.jax_cache"))
    if os.environ.get("JAX_PLATFORMS"):
        # this image's axon TPU plugin re-registers itself regardless of
        # JAX_PLATFORMS; pin at config level so CPU smoke runs stay on CPU
        # (same workaround as __graft_entry__.py / tests/conftest.py)
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from rlaifv_tpu.core.config import Config

    config = Config.from_json(args.config) if args.config else Config()
    if args.family:
        config.model.model_family = args.family
    if args.output_dir:
        config.training.output_dir = args.output_dir
    if args.max_steps:
        config.training.max_steps = args.max_steps

    if args.demo:
        return run_demo(config)

    from transformers import AutoTokenizer

    from rlaifv_tpu.data.collator import DPOCollator
    from rlaifv_tpu.data.datasets import DPODataset
    from rlaifv_tpu.train.family import get_family
    from rlaifv_tpu.train.ref_logp import inference_logp
    from rlaifv_tpu.train.trainer import DPOTrainer

    family = config.model.model_family
    if family not in MODEL_BUILDERS:
        get_family(family)  # raises with the trainable-family list
    cfg, model = MODEL_BUILDERS[family](config)
    spec = get_family(family)
    print(f"[train] loading checkpoint {config.model.model_name_or_path}")
    params = load_params(config, cfg)
    tokenizer = AutoTokenizer.from_pretrained(
        config.model.model_name_or_path,
        use_fast=(family != "llava15"),
    )
    tokenizer.model_max_length = config.data.max_len
    if tokenizer.pad_token is None:
        tokenizer.pad_token = tokenizer.unk_token

    proc = spec.image_processor(cfg.vision.image_size)
    mm_cfg = spec.mm_cfg(proc, cfg.num_image_tokens)
    mm_cfg["is_multimodal"] = config.data.is_multimodal

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
            family=family,
        )

    dataset = DPODataset(tokenizer, config.data.data_dir, mm_cfg,
                         score_fn=score_fn,
                         preprocess_func=spec.preprocess_func)
    collator = DPOCollator(
        pad_token_id=tokenizer.pad_token_id,
        max_len=config.data.max_len,
        num_patches=cfg.num_image_tokens,
        beta=config.training.dpo_beta,
        mod_token_weight=config.training.dpo_token_weight,
        task=config.training.task,
        **spec.collator_kwargs(tokenizer),
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
            adapter=spec.adapter(model),
        )
    else:
        trainer = DPOTrainer(config, model, params, dataset, collator,
                             adapter=spec.adapter(model))
    trainer.train()
    print("[train] done")


def run_demo(config):
    """Tiny synthetic end-to-end run for the configured model_family
    (llava15 or omnilmm) — no checkpoint needed."""
    import jax
    import jax.numpy as jnp

    from rlaifv_tpu.data.collator import DPOCollator
    from rlaifv_tpu.train.trainer import DPOTrainer

    family = config.model.model_family
    if family == "omnilmm":
        from rlaifv_tpu.models.omnilmm import OmniLMMConfig, OmniLMMForCausalLM
        from rlaifv_tpu.train.train_step import OmnilmmDPOAdapter
        from rlaifv_tpu.utils.synth import synth_omni_preference_pairs

        cfg = OmniLMMConfig.tiny()
        model = OmniLMMForCausalLM(cfg)
        pairs = synth_omni_preference_pairs(
            cfg, 16, answer_len=12, question_len=8
        )
        adapter = OmnilmmDPOAdapter(model)
        collator_kw = {"expand_images": False, "image_patch_id": 250}
    else:
        from rlaifv_tpu.models.llava import LlavaConfig, LlavaForCausalLM
        from rlaifv_tpu.utils.synth import synth_preference_pairs

        cfg = LlavaConfig.tiny()
        model = LlavaForCausalLM(cfg)
        pairs = synth_preference_pairs(cfg, 16, answer_len=12, question_len=8)
        adapter = None
        collator_kw = {}
    P = cfg.num_image_tokens

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
    if config.training.output_dir == "./output":
        # default dir is shared across families; a llava demo checkpoint
        # must not auto-resume into an omni tree (and vice versa)
        config.training.output_dir = f"./output/demo_{family}"
    collator = DPOCollator(pad_token_id=0, max_len=64, num_patches=P,
                           **collator_kw)
    trainer = DPOTrainer(config, model, params, _DS(), collator,
                         adapter=adapter)
    state = trainer.train()
    print(f"[demo:{family}] finished at step {int(state.step)}")


if __name__ == "__main__":
    main()
