"""OmniLMM generation engine with the tiny model + fake tokenizer."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rlaifv_tpu.constants import DEFAULT_IMAGE_PATCH_TOKEN
from rlaifv_tpu.genai.omni_gen import (
    OmniLMMGenerator,
    expand_question_multimodal,
    wrap_question_for_omni_lmm,
)
from rlaifv_tpu.genai.sampling import SamplingParams
from rlaifv_tpu.models.omnilmm import OmniLMMConfig, OmniLMMForCausalLM
from tests.fake_tokenizer import FakeTokenizer


def test_expand_question_multimodal():
    turns = [{"role": "user", "content": "What is this?"}]
    out = expand_question_multimodal(turns, 3)
    assert out[0]["content"].startswith("<im_start><im_patch><im_patch><im_patch><im_end>\n")
    turns2 = [{"role": "user", "content": "Look: <image> here"}]
    out2 = expand_question_multimodal(turns2, 2)
    assert "<im_start><im_patch><im_patch><im_end>" in out2[0]["content"]
    assert "<image>" not in out2[0]["content"]


def test_wrap_question_ids():
    tok = FakeTokenizer()
    wrapped = wrap_question_for_omni_lmm("Q?", 2, tok)
    text = tok.decode(wrapped["input_ids"])
    assert "<im_patch><im_patch>" in text
    assert text.rstrip().endswith("<|assistant|>")


@pytest.fixture(scope="module")
def omni_gen():
    # vocab must cover FakeTokenizer's id space (specials live at 314-316;
    # tiny()'s 256 made every embedding gather OOB -> NaN logits)
    from rlaifv_tpu.models.llama import LlamaConfig

    cfg = OmniLMMConfig.tiny()
    cfg = OmniLMMConfig(
        llm=LlamaConfig.tiny(num_kv_heads=2, vocab_size=512),
        vision=cfg.vision,
        num_query=cfg.num_query,
    )
    model = OmniLMMForCausalLM(cfg)
    tok = FakeTokenizer()
    size = cfg.vision.image_size
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.ones((1, cfg.num_query + 8), jnp.int32),
        images=jnp.zeros((1, size, size, 3)),
        image_starts=jnp.asarray([1]),
    )["params"]
    return cfg, OmniLMMGenerator(model, params, tok, image_size=size), tok


def _items(cfg, n):
    rng = np.random.default_rng(0)
    return [{
        "question": f"Is it {i}? Please answer yes or no.",
        "question_id": i,
        "image": rng.integers(0, 255, size=(cfg.vision.image_size,
                                            cfg.vision.image_size, 3),
                              dtype=np.uint8),
        "metainfos": {"ds_question_id": f"ds{i}"},
    } for i in range(n)]


def test_omni_autocheck(omni_gen):
    cfg, gen, tok = omni_gen
    rows = gen.autocheck(_items(cfg, 2), batch_size=2)
    assert len(rows) == 2
    for r in rows:
        assert set(r["scores"]) == {"yes", "Yes", "no", "No"}
        # finite, valid probabilities (a vocab/tokenizer mismatch once made
        # these silently NaN)
        assert all(0.0 <= v <= 1.0 for v in r["scores"].values())
        assert r["ds_question_id"].startswith("ds")


@pytest.mark.slow
def test_omni_autocheck_shared_prefix_parity(omni_gen):
    """Shared-prefix scoring (one EVA02 encode + one prefix prefill per
    image) must match the plain full-prefill scores."""
    cfg, gen, tok = omni_gen
    items = _items(cfg, 4)
    img = items[0]["image"]
    for it in items:
        it["image"] = img  # one image, many facts -> one shared group
    items[1]["question"] = ("Is there a very small red thing near the top "
                            "left corner? Please answer yes or no.")
    plain = gen.autocheck(items, batch_size=2, shared_prefix=False)
    shared = gen.autocheck(items, batch_size=2, shared_prefix=True)
    for a, b in zip(plain, shared):
        assert a["answer"] == b["answer"]
        for w in a["scores"]:
            assert abs(a["scores"][w] - b["scores"][w]) < 1e-4


@pytest.mark.slow
def test_omni_diverse_gen(omni_gen):
    cfg, gen, tok = omni_gen
    rows = gen.diverse_gen(_items(cfg, 2), max_new_tokens=3, batch_size=2)
    assert len(rows) == 2 and all("answer" in r for r in rows)


def _write_tiny_omni_checkpoint(tmp_path):
    """Write a tiny real-format OmniLMM checkpoint directory
    (Mistral LM + timm-style EVA tower + resampler tensors)."""
    import json
    import torch
    from safetensors.torch import save_file
    from transformers import MistralConfig as HFMC
    from transformers import MistralForCausalLM as HFMistral

    torch.manual_seed(0)
    H, EVA_D, NQ = 16, 32, 4
    llm = HFMistral(HFMC(vocab_size=64, hidden_size=H, intermediate_size=32,
                         num_hidden_layers=2, num_attention_heads=2,
                         num_key_value_heads=2, max_position_embeddings=64))
    sd = dict(llm.state_dict())

    from rlaifv_tpu.models.eva02 import EvaConfig

    ecfg = EvaConfig.tiny(embed_dim=EVA_D)
    P, D = ecfg.patch_size, ecfg.embed_dim
    eva = {
        "patch_embed.proj.weight": torch.randn(D, 3, P, P),
        "patch_embed.proj.bias": torch.randn(D),
        "cls_token": torch.randn(1, 1, D),
        "pos_embed": torch.randn(1, ecfg.grid ** 2 + 1, D),
        "norm.weight": torch.ones(D),
        "norm.bias": torch.zeros(D),
    }
    for i in range(ecfg.depth):
        eva.update({
            f"blocks.{i}.norm1.weight": torch.ones(D),
            f"blocks.{i}.norm1.bias": torch.zeros(D),
            f"blocks.{i}.norm2.weight": torch.ones(D),
            f"blocks.{i}.norm2.bias": torch.zeros(D),
            f"blocks.{i}.attn.qkv.weight": torch.randn(3 * D, D) * 0.02,
            f"blocks.{i}.attn.qkv.bias": torch.zeros(3 * D),
            f"blocks.{i}.attn.proj.weight": torch.randn(D, D) * 0.02,
            f"blocks.{i}.attn.proj.bias": torch.zeros(D),
            f"blocks.{i}.mlp.fc1.weight": torch.randn(ecfg.mlp_hidden, D) * 0.02,
            f"blocks.{i}.mlp.fc1.bias": torch.zeros(ecfg.mlp_hidden),
            f"blocks.{i}.mlp.fc2.weight": torch.randn(D, ecfg.mlp_hidden) * 0.02,
            f"blocks.{i}.mlp.fc2.bias": torch.zeros(D),
        })
    for k, v in eva.items():
        sd[f"model.vision_tower.{k}"] = v

    res = {
        "query": torch.randn(NQ, H),
        "pos_embed": torch.randn(NQ, H),
        "kv_proj.weight": torch.randn(H, EVA_D),
        "attn.in_proj_weight": torch.randn(3 * H, H),
        "attn.in_proj_bias": torch.zeros(3 * H),
        "attn.out_proj.weight": torch.randn(H, H),
        "attn.out_proj.bias": torch.zeros(H),
        "ln_q.weight": torch.ones(H), "ln_q.bias": torch.zeros(H),
        "ln_kv.weight": torch.ones(H), "ln_kv.bias": torch.zeros(H),
        "ln_post.weight": torch.ones(H), "ln_post.bias": torch.zeros(H),
        "proj": torch.randn(H, H),
    }
    for k, v in res.items():
        sd[f"model.resampler.{k}"] = v

    d = str(tmp_path / "omni")
    import os
    os.makedirs(d)
    save_file({k: v.contiguous() for k, v in sd.items()},
              os.path.join(d, "model.safetensors"))
    cfg_json = {
        "architectures": ["OmniLMMForCausalLM"],
        "vocab_size": 64, "hidden_size": H, "intermediate_size": 32,
        "num_hidden_layers": 2, "num_attention_heads": 2,
        "num_key_value_heads": 2, "max_position_embeddings": 64,
        "num_query": NQ,
        "eva_config": {"image_size": ecfg.image_size, "patch_size": P,
                       "embed_dim": D, "depth": ecfg.depth,
                       "num_heads": ecfg.num_heads,
                       "mlp_hidden": ecfg.mlp_hidden},
    }
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg_json, f)
    return d


@pytest.mark.slow
def test_omnilmm_chat_from_checkpoint(tmp_path):
    """OmniLMMChat end-to-end from a real-format checkpoint directory."""
    from rlaifv_tpu.genai.omni_gen import OmniLMMChat
    from rlaifv_tpu.models.eva02 import EvaConfig

    d = _write_tiny_omni_checkpoint(tmp_path)
    ecfg = EvaConfig.tiny(embed_dim=32)
    m = OmniLMMChat(d, tokenizer=FakeTokenizer(), max_new_tokens=5,
                    image_size=ecfg.image_size)
    m.gen.engine.eos_id = -1  # random weights: force a full tiny decode
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(ecfg.image_size, ecfg.image_size, 3),
                       dtype=np.uint8)
    out = m.chat({"question": "What do you see?", "image": img})
    assert isinstance(out, str)  # random tiny-vocab ids may decode empty

    rows = m.gen.generate(
        [{"question": "What do you see?", "image": img, "question_id": 0}],
        sampling=SamplingParams.chat_12b(), max_new_tokens=5, batch_size=1,
    )
    assert len(rows) == 1 and rows[0][2].shape[-1] == 64  # vocab logits


@pytest.mark.slow
def test_omnilmm_chat_int8_from_checkpoint(tmp_path):
    """OmniLMMChat(int8=True): the single-chip 12B serving path — both
    towers quantized at load — chats end-to-end from a real-format dir."""
    d = _write_tiny_omni_checkpoint(tmp_path)
    from rlaifv_tpu.genai.omni_gen import OmniLMMChat
    from rlaifv_tpu.models.eva02 import EvaConfig

    ecfg = EvaConfig.tiny(embed_dim=32)
    m = OmniLMMChat(d, tokenizer=FakeTokenizer(),
                    max_new_tokens=4, image_size=ecfg.image_size, int8=True)
    assert m.gen.engine._llm_cfg().quantize
    assert m.gen.engine._llm_cfg().kv_cache_dtype == "int8"
    m.gen.engine.eos_id = -1
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(ecfg.image_size, ecfg.image_size, 3),
                       dtype=np.uint8)
    out = m.chat({"question": "What do you see?", "image": img})
    assert isinstance(out, str)
