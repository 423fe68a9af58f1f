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


def _siglip_cfg_from_json(ckpt):
    """SiglipVisionConfig from a checkpoint's config.json (flat
    SiglipVisionModel dirs or nested vision_config of a full SiglipModel)."""
    from rlaifv_tpu.models.siglip import SiglipVisionConfig

    with open(os.path.join(ckpt, "config.json")) as f:
        raw = json.load(f)
    raw = raw.get("vision_config", raw)
    return SiglipVisionConfig.so400m(
        image_size=raw.get("image_size", 384),
        patch_size=raw.get("patch_size", 14),
        hidden_size=raw.get("hidden_size", 1152),
        intermediate_size=raw.get("intermediate_size", 4304),
        num_layers=raw.get("num_hidden_layers", 27),
        num_heads=raw.get("num_attention_heads", 16),
    )


def test_siglip_features_goldens():
    recs = _load("siglip_hf")
    _skip_if_empty(recs, "siglip_hf")
    import jax.numpy as jnp

    from rlaifv_tpu.models.convert import convert_siglip, load_state_dict_dir
    from rlaifv_tpu.models.siglip import SiglipVisionTower

    for path, z in recs:
        ckpt = _ckpt_path(z)
        tower = SiglipVisionTower(_siglip_cfg_from_json(ckpt))
        sd = load_state_dict_dir(ckpt)
        prefix = "vision_model." if any(
            k.startswith("vision_model.") for k in sd) else ""
        params = convert_siglip(sd, prefix=prefix)
        pixels = jnp.asarray(z["pixels"]).transpose(0, 2, 3, 1)
        feats = tower.apply({"params": params}, pixels)
        np.testing.assert_allclose(
            np.asarray(feats, np.float32), z["features"],
            rtol=2e-2, atol=2e-2, err_msg=path,
        )


def test_omnilmm_goldens():
    """EVA02-enormous + resampler vision embedding and (when recorded)
    Mistral text logits vs the OmniLMM-12B remote code — closes M9's
    'pending real-weight validation' the moment weights are present."""
    recs = _load("omnilmm_hf")
    _skip_if_empty(recs, "omnilmm_hf")
    import jax.numpy as jnp

    from rlaifv_tpu.models.convert import (
        convert_omnilmm,
        load_state_dict_dir,
        omnilmm_config_from_hf,
    )
    from rlaifv_tpu.models.omnilmm import OmniLMMForCausalLM

    for path, z in recs:
        ckpt = _ckpt_path(z)
        cfg = omnilmm_config_from_hf(ckpt)
        model = OmniLMMForCausalLM(cfg)
        params = convert_omnilmm(load_state_dict_dir(ckpt))
        pixels = jnp.asarray(z["pixels"]).transpose(0, 2, 3, 1)
        emb = model.apply({"params": params}, pixels,
                          method=model.encode_images)
        want = z["vision_embedding"]
        np.testing.assert_allclose(
            np.asarray(emb, np.float32).reshape(want.shape), want,
            rtol=3e-2, atol=3e-2, err_msg=f"{path} vision",
        )
        for i in range(3):
            if f"ids_{i}" not in z:
                continue
            logits = model.apply(
                {"params": params}, jnp.asarray(z[f"ids_{i}"])[None],
                method=model.forward_text,
            )
            np.testing.assert_allclose(
                np.asarray(logits[0], np.float32), z[f"logits_{i}"],
                rtol=2e-2, atol=2e-2, err_msg=f"{path} seq {i}",
            )


def test_minicpmv_goldens():
    recs = _load("minicpmv_hf")
    _skip_if_empty(recs, "minicpmv_hf")
    import jax.numpy as jnp

    from rlaifv_tpu.models.convert import (
        convert_minicpmv,
        load_state_dict_dir,
        minicpmv_config_from_hf,
    )
    from rlaifv_tpu.models.minicpmv import MiniCPMVForCausalLM

    for path, z in recs:
        ckpt = _ckpt_path(z)
        cfg = minicpmv_config_from_hf(ckpt)
        model = MiniCPMVForCausalLM(cfg)
        params = convert_minicpmv(load_state_dict_dir(ckpt))
        if "vision_embedding" in z:
            pixels = jnp.asarray(z["pixels"]).transpose(0, 2, 3, 1)
            emb = model.apply({"params": params}, pixels,
                              method=model.encode_slices)
            want = z["vision_embedding"]
            np.testing.assert_allclose(
                np.asarray(emb, np.float32).reshape(want.shape), want,
                rtol=3e-2, atol=3e-2, err_msg=f"{path} vision",
            )
        for i in range(3):
            if f"ids_{i}" not in z:
                continue
            logits, _ = model.apply(
                {"params": params}, jnp.asarray(z[f"ids_{i}"])[None],
                method=lambda m, ids: m.llm(input_ids=ids),
            )
            np.testing.assert_allclose(
                np.asarray(logits[0], np.float32), z[f"logits_{i}"],
                rtol=2e-2, atol=2e-2, err_msg=f"{path} seq {i}",
            )


def test_chat_llava_goldens():
    """End-to-end chat golden (ref README.md:140-148 expected answer on
    examples/test.jpeg): replay the recorded prompt through our converted
    model + decode engine — greedy text must equal the torch recording,
    and the last-prompt-position logits must match. Validates tokenization
    + image preprocess + splice + decode in one shot."""
    recs = _load("chat_llava")
    _skip_if_empty(recs, "chat_llava")
    import jax.numpy as jnp

    from rlaifv_tpu.constants import IMAGE_TOKEN_INDEX
    from rlaifv_tpu.data.multimodal import expand_image_sentinels
    from rlaifv_tpu.genai.engine import DecodeEngine
    from rlaifv_tpu.genai.sampling import SamplingParams
    from rlaifv_tpu.models.convert import (
        llava_config_from_hf,
        load_llava_checkpoint,
    )
    from rlaifv_tpu.models.llava import LlavaForCausalLM
    from transformers import AutoTokenizer

    for path, z in recs:
        ckpt = _ckpt_path(z)
        cfg = llava_config_from_hf(ckpt)
        model = LlavaForCausalLM(cfg)
        params = load_llava_checkpoint(ckpt)
        tok = AutoTokenizer.from_pretrained(ckpt, use_fast=True)
        P = cfg.num_image_tokens
        img_id = int(z["image_token_id"])

        ids = np.asarray(z["input_ids"]).astype(np.int64)
        # normalize to our pre-expanded layout: HF processors either keep
        # ONE <image> token or pre-expand to P copies — map both to the
        # -200 sentinel and expand host-side
        pos = np.nonzero(ids == img_id)[0]
        if len(pos) == P:  # already expanded: collapse back to one sentinel
            ids = np.concatenate(
                [ids[: pos[0]], [IMAGE_TOKEN_INDEX], ids[pos[-1] + 1 :]]
            )
        elif len(pos) == 1:
            ids[pos[0]] = IMAGE_TOKEN_INDEX
        ex = expand_image_sentinels(
            ids, np.full_like(ids, -100), P, 4096
        )
        prompt_ids = ex["input_ids"].tolist()
        start = int(ex["image_start"])

        pixels = np.asarray(z["pixel_values"]).transpose(1, 2, 0)[None]
        engine = DecodeEngine(
            model, params,
            eos_id=tok.eos_token_id, pad_id=tok.pad_token_id or 0,
        )
        res = engine.generate(
            [prompt_ids], images=pixels, image_starts=np.asarray([start]),
            sampling=SamplingParams.greedy(), max_new_tokens=96,
        )
        got = tok.decode(
            res.tokens[0][: res.lengths[0]], skip_special_tokens=True
        ).strip()
        assert got == str(z["greedy_text"]), (
            f"{path}: greedy chat mismatch\n ours: {got}\n ref: "
            f"{z['greedy_text']}"
        )
        np.testing.assert_allclose(
            np.asarray(res.first_logits[0], np.float32), z["first_logits"],
            rtol=3e-2, atol=3e-2, err_msg=f"{path} first logits",
        )


def test_llama_int8_drift_goldens():
    """int8 weight-only quantization quality gate on real weights: the
    quantized conversion must keep greedy next-token agreement with the
    recorded fp32 logits on the probe sequences (round-1 measured ~1%
    logit-level drift on random weights only — this arms the same check
    with real-checkpoint statistics the moment goldens exist)."""
    recs = _load("llama_hf")
    _skip_if_empty(recs, "llama_hf")
    import jax.numpy as jnp

    from rlaifv_tpu.models.convert import (
        convert_llama,
        llama_config_from_hf,
        load_state_dict_dir,
        quantize_llm_int8,
    )
    from rlaifv_tpu.models.llama import LlamaForCausalLM

    for path, z in recs:
        ckpt = _ckpt_path(z)
        cfg = llama_config_from_hf(ckpt, quantize=True,
                                   quantize_lm_head=False)
        model = LlamaForCausalLM(cfg)
        params = quantize_llm_int8(
            convert_llama(load_state_dict_dir(ckpt)), include_lm_head=False
        )
        for i in range(3):
            ids = jnp.asarray(z[f"ids_{i}"])[None]
            logits, _ = model.apply({"params": params}, ids)
            got = np.asarray(logits[0], np.float32)
            want = z[f"logits_{i}"]
            # greedy tokens must agree on >= 90% of positions, and the
            # logit drift must stay small relative to the logit scale
            agree = (got.argmax(-1) == want.argmax(-1)).mean()
            assert agree >= 0.9, f"{path} seq {i}: greedy agreement {agree}"
            rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
            assert rel < 0.05, f"{path} seq {i}: rel logit drift {rel}"


def test_llama_int4_drift_goldens():
    """int4 (nibble-packed + group-128 scales) quality gate on real weights:
    greedy next-token agreement vs the recorded fp32 logits. Looser than
    the int8 gate (4-bit grouped quantization is the bitsandbytes-nf4
    quality class, not lossless) but still catches a broken converter or
    kernel the moment real goldens exist — the probe sequences at ~14%
    weight RMS error must keep the argmax on most positions."""
    recs = _load("llama_hf")
    _skip_if_empty(recs, "llama_hf")
    import jax.numpy as jnp

    from rlaifv_tpu.models.convert import (
        convert_llama,
        llama_config_from_hf,
        load_state_dict_dir,
        quantize_llm_int4,
    )
    from rlaifv_tpu.models.llama import LlamaForCausalLM

    for path, z in recs:
        ckpt = _ckpt_path(z)
        cfg = llama_config_from_hf(ckpt, quantize=True, quantize_bits=4,
                                   quantize_lm_head=False)
        model = LlamaForCausalLM(cfg)
        params = quantize_llm_int4(convert_llama(load_state_dict_dir(ckpt)))
        for i in range(3):
            ids = jnp.asarray(z[f"ids_{i}"])[None]
            logits, _ = model.apply({"params": params}, ids)
            got = np.asarray(logits[0], np.float32)
            want = z[f"logits_{i}"]
            agree = (got.argmax(-1) == want.argmax(-1)).mean()
            assert agree >= 0.75, f"{path} seq {i}: greedy agreement {agree}"
            rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
            assert rel < 0.15, f"{path} seq {i}: rel logit drift {rel}"


def test_llama_int4_smooth_drift_goldens():
    """Smoothed int4 (models/quant_smooth.py) on real weights must be at
    least as good as plain int4 — tighter gate (85% agreement / 0.10
    drift vs plain's 75%/0.15): on structured synthetics smoothing took
    greedy agreement 0.25 -> 1.00, and real transformer activations ARE
    outlier-structured (the AWQ observation). Auto-skips until egress
    lets goldens record; calibrates on the probe sequences themselves."""
    recs = _load("llama_hf")
    _skip_if_empty(recs, "llama_hf")
    import jax.numpy as jnp

    from rlaifv_tpu.models.convert import (
        convert_llama,
        llama_config_from_hf,
        load_state_dict_dir,
    )
    from rlaifv_tpu.models.llama import LlamaForCausalLM
    from rlaifv_tpu.models.quant_smooth import quantize_llm_int4_smooth

    for path, z in recs:
        ckpt = _ckpt_path(z)
        cfg = llama_config_from_hf(ckpt, quantize=True, quantize_bits=4,
                                   quantize_lm_head=False)
        cfg_f = llama_config_from_hf(ckpt)
        fparams = convert_llama(load_state_dict_dir(ckpt))
        calib = jnp.asarray(z["ids_0"])[None]
        params = quantize_llm_int4_smooth(
            LlamaForCausalLM(cfg_f), fparams, calib
        )
        model = LlamaForCausalLM(cfg)
        for i in range(3):
            ids = jnp.asarray(z[f"ids_{i}"])[None]
            logits, _ = model.apply({"params": params}, ids)
            got = np.asarray(logits[0], np.float32)
            want = z[f"logits_{i}"]
            agree = (got.argmax(-1) == want.argmax(-1)).mean()
            assert agree >= 0.85, f"{path} seq {i}: agreement {agree}"
            rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
            assert rel < 0.10, f"{path} seq {i}: rel drift {rel}"
