"""Replay recorded real-checkpoint goldens against our converted stack.

Auto-skips when `tests/goldens/` holds no recordings (this sandbox blocks
downloads); run `scripts/record_goldens.py` against any real checkpoint to
arm them. Each test converts the SAME checkpoint through our loaders and
compares outputs to the torch-side recording — the gate that catches
weight-name mapping and config plumbing rot at real scale
(ref llava/model/builder.py:26-167; README.md:140-148 golden chat).
"""
import glob
import json
import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _load(kind):
    """All npz recordings of a kind; [] when unarmed."""
    out = []
    for path in sorted(glob.glob(os.path.join(GOLDEN_DIR, "*.npz"))):
        z = np.load(path, allow_pickle=False)
        if str(z["kind"]) == kind:
            out.append((path, z))
    return out


def _ckpt_path(z):
    p = os.environ.get("RLAIFV_GOLDEN_CKPT", str(z["model_path"]))
    if not os.path.isdir(p):
        pytest.skip(f"checkpoint dir {p} not present on this host")
    return p


def _skip_if_empty(recs, kind):
    if not recs:
        pytest.skip(f"no {kind} goldens recorded "
                    f"(scripts/record_goldens.py --kind {kind})")


def test_tokenizer_goldens():
    recs = _load("tokenizer")
    _skip_if_empty(recs, "tokenizer")
    from transformers import AutoTokenizer

    from rlaifv_tpu.data.multimodal import tokenizer_image_token
    from rlaifv_tpu.data.preprocess import preprocess_v1

    for path, z in recs:
        tok = AutoTokenizer.from_pretrained(_ckpt_path(z), use_fast=True)
        convs = json.loads(str(z["convs_json"]))
        v1 = preprocess_v1(convs, tok, has_image=True)
        for i in range(len(convs)):
            np.testing.assert_array_equal(
                v1["input_ids"][i], z[f"v1_ids_{i}"], err_msg=f"{path} v1 {i}"
            )
            np.testing.assert_array_equal(
                v1["labels"][i], z[f"v1_labels_{i}"],
                err_msg=f"{path} v1 labels {i}",
            )
            if f"imgtok_ids_{i}" in z:
                got = tokenizer_image_token(convs[i][0]["value"], tok)
                np.testing.assert_array_equal(got, z[f"imgtok_ids_{i}"])


def test_llama_logits_goldens():
    recs = _load("llama_hf")
    _skip_if_empty(recs, "llama_hf")
    import jax
    import jax.numpy as jnp

    from rlaifv_tpu.models.convert import (
        convert_llama,
        llama_config_from_hf,
        load_state_dict_dir,
    )
    from rlaifv_tpu.models.llama import LlamaForCausalLM

    for path, z in recs:
        ckpt = _ckpt_path(z)
        cfg = llama_config_from_hf(ckpt)
        model = LlamaForCausalLM(cfg)
        params = convert_llama(load_state_dict_dir(ckpt))
        for i in range(3):
            ids = jnp.asarray(z[f"ids_{i}"])[None]
            logits, _ = model.apply({"params": params}, ids)
            np.testing.assert_allclose(
                np.asarray(logits[0], np.float32), z[f"logits_{i}"],
                rtol=2e-2, atol=2e-2, err_msg=f"{path} seq {i}",
            )


def test_clip_features_goldens():
    recs = _load("clip_hf")
    _skip_if_empty(recs, "clip_hf")
    import jax.numpy as jnp

    from rlaifv_tpu.models.clip_vit import CLIPVisionTower
    from rlaifv_tpu.models.convert import (
        clip_config_from_hf,
        convert_clip_vision,
        load_state_dict_dir,
    )

    for path, z in recs:
        ckpt = _ckpt_path(z)
        cfg = clip_config_from_hf(ckpt)
        tower = CLIPVisionTower(cfg)
        params = convert_clip_vision(load_state_dict_dir(ckpt))
        # recorded pixels are NCHW; our tower is NHWC
        pixels = jnp.asarray(z["pixels"]).transpose(0, 2, 3, 1)
        feats = tower.apply({"params": params}, pixels)
        np.testing.assert_allclose(
            np.asarray(feats, np.float32), z["features"],
            rtol=2e-2, atol=2e-2, err_msg=path,
        )


def test_llava_logits_goldens():
    recs = _load("llava_hf")
    _skip_if_empty(recs, "llava_hf")
    import jax.numpy as jnp

    from rlaifv_tpu.models.convert import (
        llava_config_from_hf,
        load_llava_checkpoint,
    )
    from rlaifv_tpu.models.llava import LlavaForCausalLM

    for path, z in recs:
        ckpt = _ckpt_path(z)
        cfg = llava_config_from_hf(ckpt)
        model = LlavaForCausalLM(cfg)
        params = load_llava_checkpoint(ckpt)
        ids = np.asarray(z["input_ids"])
        img_tok = int((ids < 0).argmax()) if (ids < 0).any() else -1
        pixels = jnp.asarray(z["pixel_values"]).transpose(1, 2, 0)[None]
        logits, _ = model.apply(
            {"params": params},
            jnp.asarray(ids)[None],
            images=pixels,
            image_starts=jnp.asarray([img_tok]),
        )
        np.testing.assert_allclose(
            np.asarray(logits[0], np.float32), z["logits"],
            rtol=3e-2, atol=3e-2, err_msg=path,
        )
