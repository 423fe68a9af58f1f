"""Weight converters for the OmniLMM / MiniCPM families (tiny random)."""
import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from rlaifv_tpu.models.convert import convert_eva02, convert_minicpmv, convert_siglip
from rlaifv_tpu.models.siglip import SiglipVisionConfig, SiglipVisionTower


def test_siglip_converter_parity():
    from transformers import SiglipVisionConfig as HFCfg
    from transformers import SiglipVisionModel as HFModel

    hf_cfg = HFCfg(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                   num_attention_heads=4, image_size=28, patch_size=7,
                   attn_implementation="eager")
    torch.manual_seed(0)
    hf = HFModel(hf_cfg).eval()

    params = convert_siglip(hf.state_dict(), prefix="vision_model.")
    cfg = SiglipVisionConfig.tiny()
    tower = SiglipVisionTower(cfg)

    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(2, 28, 28, 3)).astype(np.float32)
    with torch.no_grad():
        want = hf(
            pixel_values=torch.tensor(imgs.transpose(0, 3, 1, 2))
        ).last_hidden_state.numpy()
    got = np.asarray(tower.apply({"params": params}, jnp.asarray(imgs)))
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3)


def test_eva02_converter_shapes():
    # structural check: fused-qkv timm-style dict converts and runs
    from rlaifv_tpu.models.eva02 import EvaConfig, EvaVisionTower

    cfg = EvaConfig.tiny()
    D, P = cfg.embed_dim, cfg.patch_size
    sd = {
        "patch_embed.proj.weight": torch.randn(D, 3, P, P),
        "patch_embed.proj.bias": torch.randn(D),
        "cls_token": torch.randn(1, 1, D),
        "pos_embed": torch.randn(1, cfg.grid ** 2 + 1, D),
        "norm.weight": torch.ones(D),
        "norm.bias": torch.zeros(D),
    }
    for i in range(cfg.depth):
        sd.update({
            f"blocks.{i}.norm1.weight": torch.ones(D),
            f"blocks.{i}.norm1.bias": torch.zeros(D),
            f"blocks.{i}.norm2.weight": torch.ones(D),
            f"blocks.{i}.norm2.bias": torch.zeros(D),
            f"blocks.{i}.attn.qkv.weight": torch.randn(3 * D, D) * 0.02,
            f"blocks.{i}.attn.qkv.bias": torch.zeros(3 * D),
            f"blocks.{i}.attn.proj.weight": torch.randn(D, D) * 0.02,
            f"blocks.{i}.attn.proj.bias": torch.zeros(D),
            f"blocks.{i}.mlp.fc1.weight": torch.randn(cfg.mlp_hidden, D) * 0.02,
            f"blocks.{i}.mlp.fc1.bias": torch.zeros(cfg.mlp_hidden),
            f"blocks.{i}.mlp.fc2.weight": torch.randn(D, cfg.mlp_hidden) * 0.02,
            f"blocks.{i}.mlp.fc2.bias": torch.zeros(D),
        })
    params = convert_eva02(sd, layers_to_run=cfg.depth - 1)
    tower = EvaVisionTower(cfg)
    out = tower.apply(
        {"params": params},
        jnp.ones((1, cfg.image_size, cfg.image_size, 3)),
    )
    assert out.shape == (1, cfg.grid ** 2, D)
    assert np.isfinite(np.asarray(out)).all()


def test_minicpmv_converter_structure():
    from transformers import LlamaConfig as HFLC
    from transformers import LlamaForCausalLM as HFLlama
    from transformers import SiglipVisionConfig as HFSC
    from transformers import SiglipVisionModel as HFSiglip

    torch.manual_seed(0)
    llm = HFLlama(HFLC(vocab_size=64, hidden_size=16, intermediate_size=32,
                       num_hidden_layers=2, num_attention_heads=2,
                       num_key_value_heads=2))
    vis = HFSiglip(HFSC(hidden_size=32, intermediate_size=64,
                        num_hidden_layers=2, num_attention_heads=4,
                        image_size=28, patch_size=7))
    sd = {}
    for k, v in llm.state_dict().items():
        sd["llm." + k] = v
    for k, v in vis.state_dict().items():
        sd["vpm." + k] = v
    # resampler tensors (OmniLMM/MiniCPM naming)
    D, KV = 16, 32
    sd.update({
        "resampler.query": torch.randn(4, D),
        "resampler.pos_embed": torch.randn(4, D),
        "resampler.kv_proj.weight": torch.randn(D, KV),
        "resampler.attn.in_proj_weight": torch.randn(3 * D, D),
        "resampler.attn.in_proj_bias": torch.zeros(3 * D),
        "resampler.attn.out_proj.weight": torch.randn(D, D),
        "resampler.attn.out_proj.bias": torch.zeros(D),
        "resampler.ln_q.weight": torch.ones(D),
        "resampler.ln_q.bias": torch.zeros(D),
        "resampler.ln_kv.weight": torch.ones(D),
        "resampler.ln_kv.bias": torch.zeros(D),
        "resampler.ln_post.weight": torch.ones(D),
        "resampler.ln_post.bias": torch.zeros(D),
        "resampler.proj": torch.randn(D, D),
    })
    tree = convert_minicpmv(sd)
    assert set(tree) == {"llm", "vpm", "resampler"}
    assert "layer_1" in tree["vpm"]
    assert tree["resampler"]["attn_q"]["kernel"].shape == (D, D)
