"""Feature parity: our flax CLIP tower vs HF CLIPVisionModel hidden layer -2."""
import numpy as np
import torch
import jax.numpy as jnp

from rlaifv_tpu.models.clip_vit import CLIPVisionConfig, CLIPVisionTower
from rlaifv_tpu.models.convert import convert_clip_vision


def test_clip_tower_parity():
    from transformers import CLIPVisionConfig as HFCfg
    from transformers import CLIPVisionModel as HFModel

    hf_cfg = HFCfg(
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        image_size=28,
        patch_size=7,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = HFModel(hf_cfg).eval()

    cfg = CLIPVisionConfig.tiny()
    params = convert_clip_vision(
        hf.state_dict(), prefix="vision_model.", layers_to_run=cfg.layers_to_run
    )
    tower = CLIPVisionTower(cfg)

    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(2, 28, 28, 3)).astype(np.float32)

    with torch.no_grad():
        out = hf(
            pixel_values=torch.tensor(imgs.transpose(0, 3, 1, 2)),
            output_hidden_states=True,
        )
        # reference feature_select: hidden_states[-2], drop CLS
        # (llava/model/multimodal_encoder/clip_encoder.py:36-44)
        want = out.hidden_states[-2][:, 1:].numpy()

    got = np.asarray(tower.apply({"params": params}, jnp.asarray(imgs)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)
