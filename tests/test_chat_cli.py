"""chat.py end-to-end against a tiny real-format checkpoint directory."""
import json
import os
import string
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@pytest.fixture(scope="module")
def tiny_checkpoint(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tiny_llava"))
    from tests.test_loader_variants import _make_tiny_llava_sd

    _make_tiny_llava_sd(d)
    cfg = {
        "architectures": ["LlavaLlamaForCausalLM"],
        "vocab_size": 64, "hidden_size": 16, "intermediate_size": 32,
        "num_hidden_layers": 2, "num_attention_heads": 2,
        "num_key_value_heads": 2, "max_position_embeddings": 2048,
        "rope_theta": 10000.0, "rms_norm_eps": 1e-6,
        "mm_projector_type": "mlp2x_gelu", "mm_vision_select_layer": -2,
        "image_aspect_ratio": "pad",
        "vision_config": {"image_size": 14, "patch_size": 7,
                          "hidden_size": 16, "intermediate_size": 32,
                          "num_hidden_layers": 2, "num_attention_heads": 2},
    }
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)

    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers
    from tokenizers.processors import TemplateProcessing
    from transformers import PreTrainedTokenizerFast

    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Metaspace(replacement="▁")
    tok.decoder = decoders.Metaspace(replacement="▁")
    corpus = ["a chat between user assistant car stop red light why did"] * 10
    tok.train_from_iterator(
        corpus,
        trainers.BpeTrainer(vocab_size=60,
                            special_tokens=["<unk>", "<s>", "</s>"]),
    )
    tok.post_processor = TemplateProcessing(
        single="<s> $A", special_tokens=[("<s>", tok.token_to_id("<s>"))]
    )
    PreTrainedTokenizerFast(
        tokenizer_object=tok, bos_token="<s>", eos_token="</s>",
        unk_token="<unk>", pad_token="<unk>",
    ).save_pretrained(d)
    return d


@pytest.mark.slow
def test_chat_end_to_end(tiny_checkpoint, tmp_path):
    from PIL import Image

    img_path = str(tmp_path / "img.jpeg")
    rng = np.random.default_rng(0)
    Image.fromarray(
        rng.integers(0, 255, size=(60, 80, 3), dtype=np.uint8)
    ).save(img_path, quality=90)

    from chat import RLAIFVChat

    m = RLAIFVChat(tiny_checkpoint)
    # model geometry came from config.json, not hardcoded 7B
    assert m.model.cfg.llm.hidden_size == 16
    assert m.model.cfg.num_image_tokens == 4

    out = m.chat({"image": img_path, "question": "why did the car stop"})
    assert isinstance(out, str)  # random weights may emit eos immediately

    # force past EOS to prove the full decode loop produces text
    m.model.engine.eos_id = -1
    m.model.engine._gen_fns.clear()
    m.model.max_new_tokens = 8
    out2 = m.model.chat({"image": img_path, "question": "why did the car stop"})
    assert len(out2) > 0


@pytest.fixture(scope="module")
def tiny_anyres_checkpoint(tmp_path_factory, tiny_checkpoint):
    """Same tiny weights, LLaVA-1.6-style config: anyres + spatial_unpad."""
    import shutil
    import torch
    from safetensors.torch import save_file

    d = str(tmp_path_factory.mktemp("tiny_llava_anyres"))
    for f in os.listdir(tiny_checkpoint):
        shutil.copy(os.path.join(tiny_checkpoint, f), d)
    torch.manual_seed(7)
    save_file({"model.image_newline": torch.randn(16)},
              os.path.join(d, "model-extra.safetensors"))
    with open(os.path.join(d, "config.json")) as f:
        cfg = json.load(f)
    cfg.update(
        image_aspect_ratio="anyres",
        image_grid_pinpoints=[[14, 14], [14, 28], [28, 14], [28, 28]],
        mm_patch_merge_type="spatial_unpad",
    )
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)
    return d


@pytest.mark.slow
def test_chat_anyres_end_to_end(tiny_anyres_checkpoint, tmp_path):
    from PIL import Image

    img_path = str(tmp_path / "img.jpeg")
    rng = np.random.default_rng(1)
    Image.fromarray(
        rng.integers(0, 255, size=(60, 80, 3), dtype=np.uint8)
    ).save(img_path, quality=90)

    from chat import RLAIFV7B
    from rlaifv_tpu.models.anyres import encode_anyres

    m = RLAIFV7B(tiny_anyres_checkpoint)
    assert m.cfg.image_aspect_ratio == "anyres"
    assert m.image_newline is not None and m.image_newline.shape == (16,)

    merged = encode_anyres(
        m.model, m.engine.params, m.image_processor, m.cfg, img_path,
        image_newline=m.image_newline, encode_fn=m._encode_views,
    )
    # 80x60 image -> best grid (28, 28) -> 2x2 patch views; spatial_unpad =
    # base (4) + 4x4 grid with a newline column (4x5) = 24 ragged tokens
    assert merged.shape == (24, 16)
    assert np.isfinite(merged).all()

    m.engine.eos_id = -1  # force a full decode with random weights
    m.max_new_tokens = 6
    out = m.chat({"image": img_path, "question": "why did the car stop"})
    assert isinstance(out, str) and len(out) > 0


@pytest.mark.slow
def test_chat_int4_smooth_and_lookup(tiny_checkpoint, tmp_path, monkeypatch):
    """--load-4bit with RLAIFV_INT4_SMOOTH=1 (AWQ smoothing at load) and
    --lookup-decode ride the tiny checkpoint end-to-end."""
    from PIL import Image

    img_path = str(tmp_path / "img.jpeg")
    rng = np.random.default_rng(1)
    Image.fromarray(
        rng.integers(0, 255, size=(50, 70, 3), dtype=np.uint8)
    ).save(img_path, quality=90)

    monkeypatch.setenv("RLAIFV_INT4_SMOOTH", "1")
    from chat import RLAIFVChat

    m = RLAIFVChat(tiny_checkpoint, load_4bit=True, lookup_decode=True)
    assert m.model.cfg.llm.quantize_bits == 4
    qp = m.model.engine.params["llm"]["model"]["layer_0"]["attn"]["q_proj"]
    assert qp["kernel"].dtype == np.int8  # packed int4 after smoothing
    assert np.ndim(qp["scale"]) == 2

    m.model.engine.eos_id = -1
    m.model.max_new_tokens = 8
    out = m.chat({"image": img_path, "question": "why did the car stop"})
    assert isinstance(out, str)
