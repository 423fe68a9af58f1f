"""Round-trip gates for models/export.py: convert(export(params)) must be
bit-exact at the export dtype — the guarantee that a checkpoint trained here
drops back into the reference stack (ref llava/model/builder.py:26-167)."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlaifv_tpu.models.convert import (
    convert_llava,
    convert_peft_lora,
    fuse_llm_projections,
    llava_config_from_hf,
    load_pretrained_llava,
    quantize_llm_int8,
)
from rlaifv_tpu.models.export import (
    export_llama_sd,
    export_llava_hf,
    export_llava_sd,
    export_peft_lora,
    unfuse_llm_projections,
)
from rlaifv_tpu.models.llava import LlavaConfig, LlavaForCausalLM


def _tree_equal(a, b, path=""):
    assert isinstance(a, dict) == isinstance(b, dict), path
    if isinstance(a, dict):
        assert set(a) == set(b), f"{path}: {set(a) ^ set(b)}"
        for k in a:
            _tree_equal(a[k], b[k], f"{path}/{k}")
    else:
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32), err_msg=path
        )


@pytest.fixture(scope="module")
def tiny_params():
    cfg = LlavaConfig.tiny()
    model = LlavaForCausalLM(cfg)
    P = cfg.num_image_tokens
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.ones((1, P + 4), jnp.int32),
        images=jnp.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3)),
        image_starts=jnp.asarray([0]),
    )["params"]
    return cfg, jax.tree.map(lambda x: np.asarray(x, np.float32), params)


def test_export_convert_roundtrip(tiny_params):
    cfg, params = tiny_params
    sd = export_llava_sd(params, dtype=np.float32)
    back = convert_llava(sd, dtype=np.float32)
    _tree_equal(params, back)


def test_export_hf_dir_loads_back(tiny_params, tmp_path):
    cfg, params = tiny_params
    out = export_llava_hf(params, str(tmp_path / "ckpt"), cfg=cfg,
                          dtype=np.float32)
    assert os.path.exists(os.path.join(out, "pytorch_model.bin"))
    back = load_pretrained_llava(out, dtype=np.float32)
    _tree_equal(params, back)
    # the synthesized config.json round-trips through llava_config_from_hf
    cfg2 = llava_config_from_hf(out)
    assert cfg2.llm.hidden_size == cfg.llm.hidden_size
    assert cfg2.llm.num_layers == cfg.llm.num_layers
    assert cfg2.vision.num_layers == cfg.vision.num_layers
    assert cfg2.projector_type == cfg.projector_type
    with open(os.path.join(out, "config.json")) as f:
        assert json.load(f)["architectures"] == ["LlavaLlamaForCausalLM"]


def test_export_int8_dequantizes(tiny_params):
    cfg, params = tiny_params
    qllm = quantize_llm_int8(params["llm"])
    sd = export_llama_sd(qllm, dtype=np.float32)
    k = np.asarray(qllm["model"]["layer_0"]["attn"]["q_proj"]["kernel"])
    s = np.asarray(qllm["model"]["layer_0"]["attn"]["q_proj"]["scale"])
    np.testing.assert_array_equal(
        sd["model.layers.0.self_attn.q_proj.weight"],
        (k.astype(np.float32) * s[None, :]).T,
    )


def test_unfuse_roundtrip(tiny_params):
    cfg, params = tiny_params
    fused = fuse_llm_projections(params["llm"])
    back = unfuse_llm_projections(fused, cfg.llm)
    _tree_equal(params["llm"], back)
    # int8 layout too (per-out-channel scales split exactly)
    qfused = fuse_llm_projections(quantize_llm_int8(params["llm"]))
    qback = unfuse_llm_projections(qfused, cfg.llm)
    _tree_equal(quantize_llm_int8(params["llm"]), qback)


def test_export_peft_lora_roundtrip(tiny_params, tmp_path):
    from rlaifv_tpu.train.lora import lora_init

    cfg, params = tiny_params
    lora = lora_init(jax.random.PRNGKey(1), {"llm": params["llm"]}, r=4)
    lora = jax.tree.map(lambda x: np.asarray(x, np.float32), lora)
    # peft's lora_B starts at zero; randomize so the transpose is tested
    def randb(node):
        if isinstance(node, dict) and set(node) >= {"a", "b"}:
            node["b"] = np.random.default_rng(0).normal(
                size=node["b"].shape).astype(np.float32)
            return node
        if isinstance(node, dict):
            return {k: randb(v) for k, v in node.items()}
        return node

    lora = randb(lora)
    out = export_peft_lora(
        lora, str(tmp_path / "adapter"), alpha=16.0,
        non_lora_params={"mm_projector": params["mm_projector"]},
        dtype=np.float32,
    )
    import torch

    sd = torch.load(os.path.join(out, "adapter_model.bin"),
                    map_location="cpu", weights_only=True)
    back = convert_peft_lora(sd, dtype=np.float32)
    _tree_equal(lora, back)
    with open(os.path.join(out, "adapter_config.json")) as f:
        acfg = json.load(f)
    assert acfg["r"] == 4 and acfg["peft_type"] == "LORA"
    assert os.path.exists(os.path.join(out, "non_lora_trainables.bin"))

    # the reference loader layout: adapters + non_lora over a base dir
    base = export_llava_hf(params, str(tmp_path / "base"), cfg=cfg,
                           dtype=np.float32)
    merged = load_pretrained_llava(str(tmp_path / "adapter"), base,
                                   dtype=np.float32, lora_alpha=16.0)
    from rlaifv_tpu.train.lora import lora_merge

    expect = lora_merge(params, {"llm": lora["llm"]}, alpha=16.0)
    for blk in ("attn", "mlp"):
        _tree_equal(
            jax.tree.map(np.asarray,
                         expect["llm"]["model"]["layer_0"][blk]),
            merged["llm"]["model"]["layer_0"][blk],
        )
