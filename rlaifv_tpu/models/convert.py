"""HF checkpoint → flax param-tree converters.

Replaces the reference's `from_pretrained` loading path
(ref: llava/model/builder.py:26-167 `load_pretrained_model`) with explicit
tensor-name mapping from HF/LLaVA state dicts (torch tensors, numpy arrays,
or safetensors shards) into our flax pytrees. Supports:

- plain HF `LlamaForCausalLM` (Vicuna-7B, Llama3-8B)
- HF `CLIPVisionModel` (prefix `vision_model.`)
- composite LLaVA-1.5 checkpoints (`model.layers.*` + `model.vision_tower.
  vision_tower.vision_model.*` + `model.mm_projector.*` + `lm_head.*`)
- LoRA adapter merging as param-tree deltas (ref builder.py:52-86), see
  rlaifv_tpu/train/lora.py.

All converters are pure functions: dict[str, np.ndarray] -> nested dict.
"""
from __future__ import annotations

import os
import re
from typing import Any, Dict, Mapping, Optional

import numpy as np

Tree = Dict[str, Any]


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor
        x = x.detach().to("cpu")
        # torch bf16 has no numpy dtype; go through float32
        if str(x.dtype) == "torch.bfloat16":
            x = x.float()
        return x.numpy()
    return np.asarray(x)


def _set(tree: Tree, path: str, value: np.ndarray) -> None:
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def load_state_dict_dir(model_dir: str) -> Dict[str, np.ndarray]:
    """Read all safetensors (or torch .bin) shards from a checkpoint dir."""
    sd: Dict[str, np.ndarray] = {}
    st_files = sorted(
        f for f in os.listdir(model_dir) if f.endswith(".safetensors")
    )
    if st_files:
        from safetensors import safe_open

        for f in st_files:
            with safe_open(os.path.join(model_dir, f), framework="np") as h:
                for k in h.keys():
                    sd[k] = h.get_tensor(k)
        return sd
    bin_files = sorted(
        f for f in os.listdir(model_dir)
        if f.endswith(".bin") and f.startswith("pytorch_model")
    )
    if not bin_files:
        raise FileNotFoundError(f"no safetensors/bin shards in {model_dir}")
    import torch

    for f in bin_files:
        shard = torch.load(
            os.path.join(model_dir, f), map_location="cpu", weights_only=True
        )
        for k, v in shard.items():
            sd[k] = _np(v)
    return sd


def convert_llama(
    sd: Mapping[str, Any], prefix: str = "", dtype=np.float32
) -> Tree:
    """HF LlamaForCausalLM state dict -> LlamaForCausalLM params."""
    g = lambda k: _np(sd[prefix + k]).astype(dtype)
    tree: Tree = {}
    _set(tree, "model/tok_embed/embedding", g("model.embed_tokens.weight"))
    layer_pat = re.compile(re.escape(prefix) + r"model\.layers\.(\d+)\.")
    n_layers = 1 + max(
        int(m.group(1)) for k in sd if (m := layer_pat.match(k))
    )
    for i in range(n_layers):
        hf = f"model.layers.{i}."
        fx = f"model/layer_{i}/"
        for name in ("q_proj", "k_proj", "v_proj", "o_proj"):
            _set(tree, fx + f"attn/{name}/kernel", g(hf + f"self_attn.{name}.weight").T)
        for name in ("gate_proj", "up_proj", "down_proj"):
            _set(tree, fx + f"mlp/{name}/kernel", g(hf + f"mlp.{name}.weight").T)
        _set(tree, fx + "ln_attn/scale", g(hf + "input_layernorm.weight"))
        _set(tree, fx + "ln_mlp/scale", g(hf + "post_attention_layernorm.weight"))
    _set(tree, "model/ln_f/scale", g("model.norm.weight"))
    if prefix + "lm_head.weight" in sd:
        _set(tree, "lm_head/kernel", g("lm_head.weight").T)
    return tree


def convert_clip_vision(
    sd: Mapping[str, Any], prefix: str = "vision_model.", dtype=np.float32,
    layers_to_run: Optional[int] = None,
) -> Tree:
    """HF CLIPVisionModel state dict -> CLIPVisionTower params.

    Only the first `layers_to_run` blocks are converted (the select_layer=-2
    tap means the final block's weights are dead, clip_encoder.py:36-44).
    """
    g = lambda k: _np(sd[prefix + k]).astype(dtype)
    tree: Tree = {}
    _set(tree, "cls_token", g("embeddings.class_embedding"))
    # (D, 3, P, P) conv -> (P, P, 3, D) flax HWIO
    _set(
        tree, "patch_embed/kernel",
        g("embeddings.patch_embedding.weight").transpose(2, 3, 1, 0),
    )
    _set(tree, "pos_embed", g("embeddings.position_embedding.weight"))
    _set(tree, "pre_ln/scale", g("pre_layrnorm.weight"))
    _set(tree, "pre_ln/bias", g("pre_layrnorm.bias"))

    layer_pat = re.compile(re.escape(prefix) + r"encoder\.layers\.(\d+)\.")
    n_layers = 1 + max(int(m.group(1)) for k in sd if (m := layer_pat.match(k)))
    if layers_to_run is not None:
        n_layers = min(n_layers, layers_to_run)
    for i in range(n_layers):
        hf = f"encoder.layers.{i}."
        fx = f"layer_{i}/"
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _set(tree, fx + f"attn/{name}/kernel", g(hf + f"self_attn.{name}.weight").T)
            _set(tree, fx + f"attn/{name}/bias", g(hf + f"self_attn.{name}.bias"))
        _set(tree, fx + "ln1/scale", g(hf + "layer_norm1.weight"))
        _set(tree, fx + "ln1/bias", g(hf + "layer_norm1.bias"))
        _set(tree, fx + "ln2/scale", g(hf + "layer_norm2.weight"))
        _set(tree, fx + "ln2/bias", g(hf + "layer_norm2.bias"))
        _set(tree, fx + "fc1/kernel", g(hf + "mlp.fc1.weight").T)
        _set(tree, fx + "fc1/bias", g(hf + "mlp.fc1.bias"))
        _set(tree, fx + "fc2/kernel", g(hf + "mlp.fc2.weight").T)
        _set(tree, fx + "fc2/bias", g(hf + "mlp.fc2.bias"))
    return tree


def convert_llava(
    sd: Mapping[str, Any], dtype=np.float32, vision_layers_to_run: Optional[int] = None
) -> Tree:
    """Composite LLaVA-1.5 checkpoint -> LlavaForCausalLM params.

    Key layout in reference checkpoints (llava/model/language_model/
    llava_llama.py registers LlavaLlamaForCausalLM under the Llama arch):
      model.embed_tokens.* / model.layers.* / model.norm.* / lm_head.*
      model.vision_tower.vision_tower.vision_model.*
      model.mm_projector.{0,2}.{weight,bias}   (mlp2x_gelu: Linear-GELU-Linear)
    """
    llm_sd = {
        k: v for k, v in sd.items()
        if not k.startswith(("model.vision_tower", "model.mm_projector"))
    }
    tree: Tree = {"llm": convert_llama(llm_sd, dtype=dtype)}

    tree["vision_tower"] = convert_clip_vision(
        sd,
        prefix="model.vision_tower.vision_tower.vision_model.",
        dtype=dtype,
        layers_to_run=vision_layers_to_run,
    )

    proj: Tree = {}
    # torch Sequential indices 0,2,4... are the Linear layers of mlpNx_gelu
    proj_keys = sorted(
        {int(m.group(1)) for k in sd
         if (m := re.match(r"model\.mm_projector\.(\d+)\.weight", k))}
    )
    for out_i, seq_i in enumerate(proj_keys):
        proj[f"fc{out_i}"] = {
            "kernel": _np(sd[f"model.mm_projector.{seq_i}.weight"]).astype(dtype).T,
            "bias": _np(sd[f"model.mm_projector.{seq_i}.bias"]).astype(dtype),
        }
    tree["mm_projector"] = proj
    return tree


def llava_config_from_hf(model_dir: str, **overrides):
    """Build LlavaConfig from the checkpoint's config.json (HF LlavaConfig /
    reference LlavaLlamaForCausalLM layout). Falls back to 7B defaults for
    missing fields (ref builder.py relies on from_pretrained for this)."""
    import json as _json

    from rlaifv_tpu.models.clip_vit import CLIPVisionConfig
    from rlaifv_tpu.models.llama import LlamaConfig
    from rlaifv_tpu.models.llava import LlavaConfig

    cfg_path = os.path.join(model_dir, "config.json")
    raw = {}
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            raw = _json.load(f)

    llm = LlamaConfig(
        vocab_size=raw.get("vocab_size", 32000),
        hidden_size=raw.get("hidden_size", 4096),
        intermediate_size=raw.get("intermediate_size", 11008),
        num_layers=raw.get("num_hidden_layers", 32),
        num_heads=raw.get("num_attention_heads", 32),
        num_kv_heads=raw.get(
            "num_key_value_heads", raw.get("num_attention_heads", 32)
        ),
        max_position_embeddings=raw.get("max_position_embeddings", 4096),
        rope_theta=raw.get("rope_theta", 10000.0),
        rms_norm_eps=raw.get("rms_norm_eps", 1e-6),
        **overrides.get("llm", {}),
    )
    vis_raw = raw.get("vision_config", {})
    mm_tower = raw.get("mm_vision_tower", "")
    image_size = vis_raw.get("image_size", 336 if "336" in str(mm_tower) else 336)
    vision = CLIPVisionConfig(
        image_size=image_size,
        patch_size=vis_raw.get("patch_size", 14),
        hidden_size=vis_raw.get("hidden_size", raw.get("mm_hidden_size", 1024)),
        intermediate_size=vis_raw.get("intermediate_size", 4096),
        num_layers=vis_raw.get("num_hidden_layers", 24),
        num_heads=vis_raw.get("num_attention_heads", 16),
        select_layer=raw.get("mm_vision_select_layer", -2),
        **overrides.get("vision", {}),
    )
    return LlavaConfig(
        llm=llm,
        vision=vision,
        projector_type=raw.get("mm_projector_type", "mlp2x_gelu"),
        image_aspect_ratio=raw.get("image_aspect_ratio", "pad"),
        image_grid_pinpoints=raw.get("image_grid_pinpoints"),
        mm_patch_merge_type=raw.get("mm_patch_merge_type", "flat"),
    )


def llama_config_from_hf(model_dir: str, **overrides):
    """LlamaConfig from a bare HF LLaMA/Vicuna/Mistral checkpoint dir
    (for text-only loads and the real-checkpoint goldens gate)."""
    import json as _json

    from rlaifv_tpu.models.llama import LlamaConfig

    with open(os.path.join(model_dir, "config.json")) as f:
        raw = _json.load(f)
    return LlamaConfig(
        vocab_size=raw.get("vocab_size", 32000),
        hidden_size=raw.get("hidden_size", 4096),
        intermediate_size=raw.get("intermediate_size", 11008),
        num_layers=raw.get("num_hidden_layers", 32),
        num_heads=raw.get("num_attention_heads", 32),
        num_kv_heads=raw.get(
            "num_key_value_heads", raw.get("num_attention_heads", 32)
        ),
        max_position_embeddings=raw.get("max_position_embeddings", 4096),
        rope_theta=raw.get("rope_theta", 10000.0),
        rms_norm_eps=raw.get("rms_norm_eps", 1e-6),
        tie_word_embeddings=raw.get("tie_word_embeddings", False),
        **overrides,
    )


def clip_config_from_hf(model_dir: str, **overrides):
    """CLIPVisionConfig from a bare HF CLIPVisionModel checkpoint dir."""
    import json as _json

    from rlaifv_tpu.models.clip_vit import CLIPVisionConfig

    with open(os.path.join(model_dir, "config.json")) as f:
        raw = _json.load(f)
    raw = raw.get("vision_config", raw)
    return CLIPVisionConfig(
        image_size=raw.get("image_size", 336),
        patch_size=raw.get("patch_size", 14),
        hidden_size=raw.get("hidden_size", 1024),
        intermediate_size=raw.get("intermediate_size", 4096),
        num_layers=raw.get("num_hidden_layers", 24),
        num_heads=raw.get("num_attention_heads", 16),
        **overrides,
    )


def load_image_newline(model_dir: str) -> Optional[np.ndarray]:
    """LLaVA-1.6 checkpoints carry a learnable `model.image_newline` (D,)
    used by the spatial_unpad anyres merge. Lazy single-tensor read."""
    key = "model.image_newline"
    for fname in sorted(os.listdir(model_dir)):
        path = os.path.join(model_dir, fname)
        if fname.endswith(".safetensors"):
            from safetensors import safe_open

            with safe_open(path, framework="np") as f:
                if key in f.keys():
                    return np.asarray(f.get_tensor(key))
        elif fname.endswith(".bin"):
            import torch

            sd = torch.load(path, map_location="cpu", weights_only=True)
            if key in sd:
                return sd[key].float().numpy()
    return None


def load_llava_checkpoint(model_dir: str, dtype=np.float32,
                          vision_layers_to_run: Optional[int] = None) -> Tree:
    return convert_llava(load_state_dict_dir(model_dir), dtype=dtype,
                         vision_layers_to_run=vision_layers_to_run)


def convert_siglip(
    sd: Mapping[str, Any], prefix: str = "vpm.", dtype=np.float32
) -> Tree:
    """HF SiglipVisionModel / MiniCPM-V `vpm.` tower -> SiglipVisionTower.

    Key layout (HF siglip + MiniCPM-V 2.5 remote code): embeddings.
    patch_embedding.{weight,bias}, embeddings.position_embedding.weight,
    encoder.layers.N.{self_attn.{q,k,v,out}_proj, layer_norm1/2, mlp.fc1/2},
    post_layernorm.
    """
    # tolerate an extra 'vision_model.' nesting
    if not any(k.startswith(prefix + "encoder") for k in sd):
        if any(k.startswith(prefix + "vision_model.encoder") for k in sd):
            prefix = prefix + "vision_model."
    g = lambda k: _np(sd[prefix + k]).astype(dtype)
    tree: Tree = {}
    _set(tree, "patch_embed/kernel",
         g("embeddings.patch_embedding.weight").transpose(2, 3, 1, 0))
    _set(tree, "patch_embed/bias", g("embeddings.patch_embedding.bias"))
    _set(tree, "pos_embed", g("embeddings.position_embedding.weight"))
    layer_pat = re.compile(re.escape(prefix) + r"encoder\.layers\.(\d+)\.")
    n_layers = 1 + max(int(m.group(1)) for k in sd if (m := layer_pat.match(k)))
    for i in range(n_layers):
        hf = f"encoder.layers.{i}."
        fx = f"layer_{i}/"
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _set(tree, fx + f"{name}/kernel", g(hf + f"self_attn.{name}.weight").T)
            _set(tree, fx + f"{name}/bias", g(hf + f"self_attn.{name}.bias"))
        _set(tree, fx + "ln1/scale", g(hf + "layer_norm1.weight"))
        _set(tree, fx + "ln1/bias", g(hf + "layer_norm1.bias"))
        _set(tree, fx + "ln2/scale", g(hf + "layer_norm2.weight"))
        _set(tree, fx + "ln2/bias", g(hf + "layer_norm2.bias"))
        _set(tree, fx + "fc1/kernel", g(hf + "mlp.fc1.weight").T)
        _set(tree, fx + "fc1/bias", g(hf + "mlp.fc1.bias"))
        _set(tree, fx + "fc2/kernel", g(hf + "mlp.fc2.weight").T)
        _set(tree, fx + "fc2/bias", g(hf + "mlp.fc2.bias"))
    _set(tree, "post_ln/scale", g("post_layernorm.weight"))
    _set(tree, "post_ln/bias", g("post_layernorm.bias"))
    return tree


def convert_eva02(
    sd: Mapping[str, Any], prefix: str = "", dtype=np.float32,
    layers_to_run: Optional[int] = None,
) -> Tree:
    """timm Eva (fused-qkv plain variant) -> EvaVisionTower.

    timm layout: patch_embed.proj.{weight,bias}, cls_token, pos_embed,
    blocks.N.{norm1, attn.{qkv,proj}, norm2, mlp.fc1/fc2}, norm.
    The last block is dead (omnilmm.py:43) and skipped.
    """
    g = lambda k: _np(sd[prefix + k]).astype(dtype)
    tree: Tree = {}
    _set(tree, "patch_embed/kernel",
         g("patch_embed.proj.weight").transpose(2, 3, 1, 0))
    _set(tree, "patch_embed/bias", g("patch_embed.proj.bias"))
    _set(tree, "cls_token", g("cls_token").reshape(-1))
    _set(tree, "pos_embed", g("pos_embed").reshape(
        -1, g("pos_embed").shape[-1]))
    layer_pat = re.compile(re.escape(prefix) + r"blocks\.(\d+)\.")
    n_layers = 1 + max(int(m.group(1)) for k in sd if (m := layer_pat.match(k)))
    run = layers_to_run if layers_to_run is not None else n_layers - 1
    for i in range(run):
        hf = f"blocks.{i}."
        fx = f"block_{i}/"
        _set(tree, fx + "norm1/scale", g(hf + "norm1.weight"))
        _set(tree, fx + "norm1/bias", g(hf + "norm1.bias"))
        _set(tree, fx + "norm2/scale", g(hf + "norm2.weight"))
        _set(tree, fx + "norm2/bias", g(hf + "norm2.bias"))
        _set(tree, fx + "attn/qkv/kernel", g(hf + "attn.qkv.weight").T)
        if prefix + hf + "attn.qkv.bias" in sd:
            _set(tree, fx + "attn/qkv/bias", g(hf + "attn.qkv.bias"))
        else:
            # EVA q/v-bias-only convention: k bias is fixed zero
            q_b = g(hf + "attn.q_bias")
            v_b = g(hf + "attn.v_bias")
            _set(tree, fx + "attn/qkv/bias",
                 np.concatenate([q_b, np.zeros_like(q_b), v_b]))
        _set(tree, fx + "attn/proj/kernel", g(hf + "attn.proj.weight").T)
        _set(tree, fx + "attn/proj/bias", g(hf + "attn.proj.bias"))
        _set(tree, fx + "mlp/fc1/kernel", g(hf + "mlp.fc1.weight").T)
        _set(tree, fx + "mlp/fc1/bias", g(hf + "mlp.fc1.bias"))
        _set(tree, fx + "mlp/fc2/kernel", g(hf + "mlp.fc2.weight").T)
        _set(tree, fx + "mlp/fc2/bias", g(hf + "mlp.fc2.bias"))
    _set(tree, "norm/scale", g("norm.weight"))
    _set(tree, "norm/bias", g("norm.bias"))
    return tree


def omnilmm_config_from_hf(model_dir: str, **overrides):
    """OmniLMMConfig from the checkpoint's config.json (the reference
    OmniLMMConfig extends MistralConfig and carries num_query; the EVA tower
    is a fixed timm model, so `eva_config` in config.json — or overrides —
    only matters for non-standard/test checkpoints)."""
    import json as _json

    from rlaifv_tpu.models.eva02 import EvaConfig
    from rlaifv_tpu.models.llama import LlamaConfig
    from rlaifv_tpu.models.omnilmm import OmniLMMConfig

    cfg_path = os.path.join(model_dir, "config.json")
    raw = {}
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            raw = _json.load(f)

    llm = LlamaConfig.mistral_7b(
        vocab_size=raw.get("vocab_size", 32000),
        hidden_size=raw.get("hidden_size", 4096),
        intermediate_size=raw.get("intermediate_size", 14336),
        num_layers=raw.get("num_hidden_layers", 32),
        num_heads=raw.get("num_attention_heads", 32),
        num_kv_heads=raw.get("num_key_value_heads", 8),
        max_position_embeddings=raw.get("max_position_embeddings", 32768),
        rope_theta=raw.get("rope_theta", 10000.0),
        rms_norm_eps=raw.get("rms_norm_eps", 1e-5),
        **overrides.get("llm", {}),
    )
    eva_kw = dict(raw.get("eva_config", {}))
    eva_kw.update(overrides.get("vision", {}))
    vision = EvaConfig.enormous(**eva_kw) if eva_kw else EvaConfig.enormous()
    return OmniLMMConfig(
        llm=llm,
        vision=vision,
        num_query=raw.get("num_query", 64),
    )


def convert_omnilmm(sd: Mapping[str, Any], dtype=np.float32,
                    vision_layers_to_run: Optional[int] = None) -> Tree:
    """OmniLMM-12B checkpoint -> OmniLMMForCausalLM params.

    Layout: Mistral LM under model.* / lm_head.*, timm Eva tower under
    model.vision_tower.*, resampler under model.resampler.*
    (ref omnilmm/model/omnilmm.py:55-106).
    """
    from rlaifv_tpu.models.resampler import convert_resampler

    llm_sd = {
        k: v for k, v in sd.items()
        if not k.startswith(("model.vision_tower", "model.resampler"))
    }
    tree: Tree = {"llm": convert_llama(llm_sd, dtype=dtype)}
    tree["vision_tower"] = convert_eva02(
        sd, prefix="model.vision_tower.", dtype=dtype,
        layers_to_run=vision_layers_to_run,
    )
    tree["resampler"] = convert_resampler(sd, prefix="model.resampler.",
                                          dtype=dtype)
    return tree


def minicpmv_config_from_hf(model_dir: str, **overrides):
    """MiniCPMVConfig from the checkpoint's config.json (MiniCPM-Llama3-V 2.5
    remote-code layout: Llama3 fields at top level, slicing knobs
    query_num/slice_mode/max_slice_nums/scale_resolution/patch_size, SigLIP
    tower fixed so400m unless a vision_config block overrides it — ref
    minicpm-llama3-v-25/minicpmv_autocheck.py:119-134 drives those knobs)."""
    import json as _json

    from rlaifv_tpu.models.llama import LlamaConfig
    from rlaifv_tpu.models.minicpmv import MiniCPMVConfig
    from rlaifv_tpu.models.siglip import SiglipVisionConfig

    cfg_path = os.path.join(model_dir, "config.json")
    raw = {}
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            raw = _json.load(f)

    llm = LlamaConfig.llama3_8b(
        vocab_size=raw.get("vocab_size", 128256),
        hidden_size=raw.get("hidden_size", 4096),
        intermediate_size=raw.get("intermediate_size", 14336),
        num_layers=raw.get("num_hidden_layers", 32),
        num_heads=raw.get("num_attention_heads", 32),
        num_kv_heads=raw.get("num_key_value_heads", 8),
        max_position_embeddings=raw.get("max_position_embeddings", 8192),
        rope_theta=raw.get("rope_theta", 500000.0),
        rms_norm_eps=raw.get("rms_norm_eps", 1e-5),
        **overrides.get("llm", {}),
    )
    vis_raw = dict(raw.get("vision_config", {}))
    vis_kw = dict(
        image_size=vis_raw.get("image_size", 980),
        patch_size=vis_raw.get("patch_size", 14),
        hidden_size=vis_raw.get("hidden_size", 1152),
        intermediate_size=vis_raw.get("intermediate_size", 4304),
        num_layers=vis_raw.get("num_hidden_layers", 27),
        num_heads=vis_raw.get("num_attention_heads", 16),
    )
    vis_kw.update(overrides.get("vision", {}))
    return MiniCPMVConfig(
        llm=llm,
        vision=SiglipVisionConfig.so400m(**vis_kw),
        query_num=raw.get("query_num", 96),
        slice_mode=raw.get("slice_mode", True),
        max_slice_nums=raw.get("max_slice_nums", 9),
        scale_resolution=raw.get("scale_resolution", 448),
        patch_size=raw.get("patch_size", 14),
    )


def convert_minicpmv(sd: Mapping[str, Any], dtype=np.float32) -> Tree:
    """MiniCPM-Llama3-V 2.5 checkpoint -> MiniCPMVForCausalLM params.

    Layout: llm.* (Llama3), vpm.* (SigLIP), resampler.*
    (MiniCPM-V remote-code module names).
    """
    from rlaifv_tpu.models.resampler import convert_resampler

    llm_sd = {
        k[len("llm."):]: v for k, v in sd.items() if k.startswith("llm.")
    }
    tree: Tree = {"llm": convert_llama(llm_sd, dtype=dtype)}
    tree["vpm"] = convert_siglip(sd, prefix="vpm.", dtype=dtype)
    # 2.5 resampler runs query_pos=False (positions ride the keys per-slice),
    # so the flax module declares no pos_embed param — skip it here too
    tree["resampler"] = convert_resampler(sd, prefix="resampler.", dtype=dtype,
                                          query_pos=False)
    return tree


def _merge_tree(base: Tree, overlay: Tree) -> Tree:
    out = dict(base)
    for k, v in overlay.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _merge_tree(out[k], v)
        else:
            out[k] = v
    return out


def convert_peft_lora(sd: Mapping[str, Any], dtype=np.float32) -> Tree:
    """peft adapter state dict -> our LoRA tree ({module: {a, b}}).

    peft keys look like 'base_model.model.model.layers.N.self_attn.q_proj.
    lora_A.weight' with lora_A (r, in), lora_B (out, r) — transposed into
    our a (in, r) / b (r, out) layout (ref builder.py:52-86 merge path).
    """
    lora: Tree = {}
    hf2fx = {"self_attn": "attn", "mlp": "mlp"}
    pat = re.compile(
        r"(?:base_model\.)?(?:model\.)*layers\.(\d+)\.(self_attn|mlp)\."
        r"(\w+_proj)\.lora_(A|B)\.weight"
    )
    for key, val in sd.items():
        m = pat.search(key)
        if not m:
            continue
        layer, block, proj, ab = m.groups()
        path = f"llm/model/layer_{layer}/{hf2fx[block]}/{proj}"
        node = lora
        for part in path.split("/"):
            node = node.setdefault(part, {})
        w = _np(val).astype(dtype)
        node["a" if ab == "A" else "b"] = w.T
    return lora


_QUANT_PROJ = re.compile(
    r"^(q_proj|k_proj|v_proj|o_proj|out_proj|gate_proj|up_proj|down_proj|"
    r"lm_head)$"
)


def quantize_llm_int8(llm_params: Tree, include_lm_head: bool = True) -> Tree:
    """Weight-only int8 for every projection/mlp/lm_head kernel (the TPU
    answer to the reference loader's load_8bit, builder.py:30-49). Matches
    QuantDense's {kernel:int8, scale:f32-per-out-channel} param layout;
    embeddings and norms stay in their float dtype. include_lm_head=False
    matches LlamaConfig.quantize_lm_head=False (QLoRA training keeps the
    head bf16 — the compact/fused DPO head paths read it as an array)."""
    from rlaifv_tpu.models.llama import quantize_kernel_int8

    def walk(node, name):
        if isinstance(node, dict):
            if (
                _QUANT_PROJ.match(name or "")
                and (include_lm_head or name != "lm_head")
                and set(node) == {"kernel"}
                and np.ndim(node["kernel"]) == 2
            ):
                q, s = quantize_kernel_int8(node["kernel"])
                return {"kernel": q, "scale": s}
            return {k: walk(v, k) for k, v in node.items()}
        return node

    return walk(llm_params, "")


def quantize_llm_int4(llm_params: Tree, include_lm_head: bool = False) -> Tree:
    """Weight-only int4 for projection/mlp kernels (the TPU answer to the
    reference loader's load_4bit, builder.py:30-49): nibble-packed int8
    storage (two weights per byte), group-wise scales (G=128, the
    AWQ/GPTQ convention — per-column int4 is too coarse at 7B quality).
    Matches QuantDense(bits=4)'s {kernel: int8 packed (K/2, N), scale:
    f32 (K//G, N)} layout; see ops/int4_matmul.py. The lm_head defaults to
    UNQUANTIZED (bits matter most in the logit projection; the int8 path
    keeps it bf16 under QLoRA for the same reason)."""
    from rlaifv_tpu.ops.int4_matmul import pick_int4_group, quantize_int4

    def walk(node, name):
        if isinstance(node, dict):
            if (
                _QUANT_PROJ.match(name or "")
                and (include_lm_head or name != "lm_head")
                and set(node) == {"kernel"}
                and np.ndim(node["kernel"]) == 2
            ):
                w = np.asarray(node["kernel"])
                q4, gs = quantize_int4(w, group=pick_int4_group(w.shape[0]))
                return {"kernel": q4, "scale": gs}
            return {k: walk(v, k) for k, v in node.items()}
        return node

    return walk(llm_params, "")


_VISION_QUANT = re.compile(
    r"^(qkv|q_proj|k_proj|v_proj|proj|out_proj|w1|w2|w3|fc1|fc2)$"
)


def quantize_vision_int8(params: Tree) -> Tree:
    """Weight-only int8 for ViT projection/MLP kernels (EVA02/CLIP/SigLIP
    naming). Matches QuantDense(use_bias=...) layout: {kernel: int8,
    scale: f32 per-out-channel[, bias: float]}. Patch-embed convs,
    norms, cls/pos embeds stay float. EVA02-enormous: 8.8G bf16 -> 4.4G,
    the enabler for 12B OmniLMM serving on one 16G chip next to its int8
    LM (ref runs the 12B labeler on A100-80G, omnilmm_autocheck.sh)."""
    from rlaifv_tpu.models.llama import quantize_kernel_int8

    def walk(node, name):
        if isinstance(node, dict):
            if (
                _VISION_QUANT.match(name or "")
                and "kernel" in node
                and np.ndim(node["kernel"]) == 2
            ):
                q, s = quantize_kernel_int8(node["kernel"])
                out = {"kernel": q, "scale": s}
                if "bias" in node:
                    out["bias"] = node["bias"]
                return out
            return {k: walk(v, k) for k, v in node.items()}
        return node

    return walk(params, "")


def quantize_vision_int4(params: Tree) -> Tree:
    """Weight-only int4 for ViT projection/MLP kernels (EVA02/CLIP/SigLIP
    naming) — nibble-packed int8 + group scales, matching
    QuantDense(bits=4, use_bias=...). Vision prefill is compute-bound, so
    this buys MEMORY:
    EVA02-enormous 4.4G int8 -> 2.2G, headroom for longer sequences or
    bigger batches beside the 12B LM on a 16G chip."""
    from rlaifv_tpu.ops.int4_matmul import pick_int4_group, quantize_int4

    def walk(node, name):
        if isinstance(node, dict):
            if (
                _VISION_QUANT.match(name or "")
                and "kernel" in node
                and np.ndim(node["kernel"]) == 2
            ):
                w = np.asarray(node["kernel"])
                q4, gs = quantize_int4(w, group=pick_int4_group(w.shape[0]))
                out = {"kernel": q4, "scale": gs}
                if "bias" in node:
                    out["bias"] = node["bias"]
                return out
            return {k: walk(v, k) for k, v in node.items()}
        return node

    return walk(params, "")


def fuse_llm_projections(llm_params: Tree) -> Tree:
    """Rewrite a Llama param tree for LlamaConfig.fuse_proj: q/k/v kernels
    concat into qkv_proj, gate/up into gate_up_proj (out axis). Works on
    both float {kernel} and int8 {kernel, scale} layouts — per-out-channel
    scales concatenate exactly, so the fused matmul is bit-identical to
    the separate ones."""

    def fuse(mods, names, out_name):
        parts = [mods.pop(n) for n in names]
        fused = {"kernel": np.concatenate(
            [np.asarray(p["kernel"]) for p in parts], axis=1
        )}
        if "scale" in parts[0]:
            scales = [np.asarray(p["scale"]) for p in parts]
            # int8: (N,) per-out-channel -> concat; int4 (QuantDense
            # bits=4): (K//G, N) group scales -> concat the out axis.
            # Both packing (along K) and grouping are orthogonal to the
            # out-axis concat, so fused stays bit-identical to separate.
            axis = 0 if scales[0].ndim == 1 else 1
            fused["scale"] = np.concatenate(scales, axis=axis)
        mods[out_name] = fused

    def walk(node):
        if not isinstance(node, dict):
            return node
        node = {k: walk(v) for k, v in node.items()}
        if {"q_proj", "k_proj", "v_proj"} <= set(node):
            fuse(node, ("q_proj", "k_proj", "v_proj"), "qkv_proj")
        if {"gate_proj", "up_proj"} <= set(node):
            fuse(node, ("gate_proj", "up_proj"), "gate_up_proj")
        return node

    return walk(llm_params)


def _quantize_llm(llm: Tree, mode) -> Tree:
    """quantize_llm=True/"int8" -> int8 per-out-channel; "int4" -> packed
    nibbles + group scales (the loader's load_8bit/load_4bit pair,
    ref llava/model/builder.py:30-49)."""
    if mode == "int4":
        return quantize_llm_int4(llm)
    return quantize_llm_int8(llm)


def load_pretrained_llava(
    model_path: str,
    model_base: Optional[str] = None,
    dtype=np.float32,
    vision_layers_to_run: Optional[int] = None,
    lora_alpha: float = 16.0,
    quantize_llm: bool = False,
) -> Tree:
    """Reference load_pretrained_model semantics (ref llava/model/
    builder.py:26-167) for the three layouts:

    - full checkpoint:                load_pretrained_llava(path)
    - LoRA adapters over a base:      load_pretrained_llava(lora_dir, base)
      (adapter_model safetensors/bin + optional non_lora_trainables.bin)
    - delta/projector-only over base: base weights overlaid with whatever
      tensors the delta dir provides (mm_projector-only checkpoints).
    """
    if model_base is None:
        params = load_llava_checkpoint(
            model_path, dtype=dtype, vision_layers_to_run=vision_layers_to_run
        )
        if quantize_llm:
            params["llm"] = _quantize_llm(params["llm"], quantize_llm)
        return params

    params = load_llava_checkpoint(
        model_base, dtype=dtype, vision_layers_to_run=vision_layers_to_run
    )

    # non-LoRA trainables (projector etc.) saved beside adapters
    non_lora_path = os.path.join(model_path, "non_lora_trainables.bin")
    if os.path.exists(non_lora_path):
        import torch

        sd = torch.load(non_lora_path, map_location="cpu", weights_only=True)
        sd = {
            k[len("base_model."):] if k.startswith("base_model.") else k: v
            for k, v in sd.items()
        }
        sd = {
            k[len("model."):] if k.startswith("model.model.") else k: v
            for k, v in sd.items()
        }
        overlay = convert_llava(
            sd, dtype=dtype, vision_layers_to_run=vision_layers_to_run
        ) if any(k.startswith("model.layers") for k in sd) else {}
        if not overlay and any("mm_projector" in k for k in sd):
            proj: Tree = {}
            for k, v in sd.items():
                m = re.match(r".*mm_projector\.(\d+)\.(weight|bias)", k)
                if not m:
                    continue
                seq_i, kind = int(m.group(1)), m.group(2)
                fc = proj.setdefault(f"fc{seq_i // 2}", {})
                arr = _np(v).astype(dtype)
                fc["kernel" if kind == "weight" else "bias"] = (
                    arr.T if kind == "weight" else arr
                )
            overlay = {"mm_projector": proj}
        params = _merge_tree(params, overlay)

    # adapters: merge a@b * alpha/r into the kernels
    try:
        adapter_sd = load_state_dict_dir(model_path)
    except FileNotFoundError:
        # peft's torch-format save name (builder.py loads it explicitly);
        # load_state_dict_dir's bin glob only matches pytorch_model*.bin
        adapter_sd = {}
        abin = os.path.join(model_path, "adapter_model.bin")
        if os.path.exists(abin):
            import torch

            adapter_sd = {
                k: _np(v) for k, v in torch.load(
                    abin, map_location="cpu", weights_only=True
                ).items()
            }
    lora = convert_peft_lora(adapter_sd, dtype=dtype)
    if lora:
        from rlaifv_tpu.train.lora import lora_merge

        params = lora_merge(params, lora, alpha=lora_alpha)
    if quantize_llm:
        params["llm"] = _quantize_llm(params["llm"], quantize_llm)
    return params
