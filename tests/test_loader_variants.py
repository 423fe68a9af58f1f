"""Model loader variants: full / LoRA-over-base / projector-only delta."""
import os

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from rlaifv_tpu.models.convert import (
    convert_peft_lora,
    load_pretrained_llava,
)


def _make_tiny_llava_sd(tmp_path, seed=0):
    """Write a tiny composite LLaVA state dict as safetensors."""
    torch.manual_seed(seed)
    from transformers import CLIPVisionConfig as HFCfg
    from transformers import CLIPVisionModel as HFVision
    from transformers import LlamaConfig as HFLC
    from transformers import LlamaForCausalLM as HFLlama

    llm = HFLlama(HFLC(vocab_size=64, hidden_size=16, intermediate_size=32,
                       num_hidden_layers=2, num_attention_heads=2,
                       num_key_value_heads=2, max_position_embeddings=32))
    vis = HFVision(HFCfg(hidden_size=16, intermediate_size=32,
                         num_hidden_layers=2, num_attention_heads=2,
                         image_size=14, patch_size=7))
    sd = {k: v for k, v in llm.state_dict().items()}
    for k, v in vis.state_dict().items():
        sd[f"model.vision_tower.vision_tower.{k}"] = v
    sd["model.mm_projector.0.weight"] = torch.randn(16, 16)
    sd["model.mm_projector.0.bias"] = torch.randn(16)
    sd["model.mm_projector.2.weight"] = torch.randn(16, 16)
    sd["model.mm_projector.2.bias"] = torch.randn(16)

    from safetensors.torch import save_file

    os.makedirs(tmp_path, exist_ok=True)
    save_file(sd, os.path.join(tmp_path, "model.safetensors"))
    return sd


def test_full_load(tmp_path):
    base = str(tmp_path / "base")
    sd = _make_tiny_llava_sd(base)
    params = load_pretrained_llava(base)
    assert "llm" in params and "vision_tower" in params and "mm_projector" in params
    np.testing.assert_allclose(
        params["mm_projector"]["fc0"]["kernel"],
        sd["model.mm_projector.0.weight"].numpy().T,
    )


def test_lora_over_base(tmp_path):
    base = str(tmp_path / "base")
    _make_tiny_llava_sd(base)
    lora_dir = str(tmp_path / "lora")
    os.makedirs(lora_dir)

    r = 2
    torch.manual_seed(1)
    adapter = {
        "base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight":
            torch.randn(r, 16),
        "base_model.model.model.layers.0.self_attn.q_proj.lora_B.weight":
            torch.randn(16, r),
    }
    from safetensors.torch import save_file

    save_file(adapter, os.path.join(lora_dir, "adapter_model.safetensors"))

    base_params = load_pretrained_llava(base)
    merged = load_pretrained_llava(lora_dir, model_base=base, lora_alpha=16.0)

    k0 = np.asarray(base_params["llm"]["model"]["layer_0"]["attn"]["q_proj"]["kernel"])
    k1 = np.asarray(merged["llm"]["model"]["layer_0"]["attn"]["q_proj"]["kernel"])
    a = adapter["base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight"].numpy().T
    b = adapter["base_model.model.model.layers.0.self_attn.q_proj.lora_B.weight"].numpy().T
    want = k0 + (a @ b) * (16.0 / r)
    np.testing.assert_allclose(k1, want, atol=1e-5)
    # untouched layer identical
    np.testing.assert_array_equal(
        np.asarray(base_params["llm"]["model"]["layer_1"]["mlp"]["down_proj"]["kernel"]),
        np.asarray(merged["llm"]["model"]["layer_1"]["mlp"]["down_proj"]["kernel"]),
    )


def test_projector_only_delta(tmp_path):
    base = str(tmp_path / "base")
    _make_tiny_llava_sd(base)
    delta = str(tmp_path / "delta")
    os.makedirs(delta)
    new_proj = {
        "model.mm_projector.0.weight": torch.ones(16, 16),
        "model.mm_projector.0.bias": torch.zeros(16),
        "model.mm_projector.2.weight": torch.ones(16, 16) * 2,
        "model.mm_projector.2.bias": torch.zeros(16),
    }
    torch.save(new_proj, os.path.join(delta, "non_lora_trainables.bin"))

    params = load_pretrained_llava(delta, model_base=base)
    np.testing.assert_allclose(
        params["mm_projector"]["fc1"]["kernel"], np.ones((16, 16)) * 2
    )
    # base llm untouched
    base_params = load_pretrained_llava(base)
    np.testing.assert_array_equal(
        np.asarray(params["llm"]["model"]["tok_embed"]["embedding"]),
        np.asarray(base_params["llm"]["model"]["tok_embed"]["embedding"]),
    )


def test_int8_quantized_load_and_forward(tmp_path):
    """load_8bit equivalent: int8 kernels + per-channel scales reproduce the
    bf16 forward within quantization tolerance and halve weight bytes."""
    import dataclasses
    import jax
    import jax.numpy as jnp

    from rlaifv_tpu.models.convert import llava_config_from_hf
    from rlaifv_tpu.models.llava import LlavaForCausalLM

    base = str(tmp_path / "base")
    _make_tiny_llava_sd(base)
    import json
    cfg_json = {
        "vocab_size": 64, "hidden_size": 16, "intermediate_size": 32,
        "num_hidden_layers": 2, "num_attention_heads": 2,
        "num_key_value_heads": 2, "max_position_embeddings": 32,
        "mm_projector_type": "mlp2x_gelu",
        "vision_config": {"image_size": 14, "patch_size": 7,
                          "hidden_size": 16, "intermediate_size": 32,
                          "num_hidden_layers": 2, "num_attention_heads": 2},
    }
    with open(os.path.join(base, "config.json"), "w") as f:
        json.dump(cfg_json, f)

    cfg = llava_config_from_hf(base)
    cfg_q = llava_config_from_hf(base, llm={"quantize": True})
    full = load_pretrained_llava(base)
    quant = load_pretrained_llava(base, quantize_llm=True)

    lq = quant["llm"]["model"]["layer_0"]["attn"]["q_proj"]
    assert lq["kernel"].dtype == np.int8 and lq["scale"].shape == (16,)
    assert quant["llm"]["lm_head"]["kernel"].dtype == np.int8
    # embeddings stay float
    assert quant["llm"]["model"]["tok_embed"]["embedding"].dtype != np.int8

    ids = jnp.asarray(np.arange(6, dtype=np.int32)[None] + 3)
    lf, _ = LlavaForCausalLM(cfg).apply(
        {"params": full}, ids, method=lambda m, i: m.llm(input_ids=i)
    )
    lquant, _ = LlavaForCausalLM(cfg_q).apply(
        {"params": quant}, ids, method=lambda m, i: m.llm(input_ids=i)
    )
    err = np.abs(np.asarray(lf) - np.asarray(lquant)).max()
    spread = np.abs(np.asarray(lf)).max()
    assert err < 0.05 * spread + 0.05, (err, spread)
