"""MiniCPM-V generation driver end-to-end with the tiny model."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rlaifv_tpu.genai.minicpmv_gen import MiniCPMVGenerator
from rlaifv_tpu.models.minicpmv import MiniCPMVConfig, MiniCPMVForCausalLM
from tests.fake_tokenizer import FakeTokenizer


@pytest.fixture(scope="module")
def gen():
    # vocab must cover FakeTokenizer's id space (<image>/<slice> specials
    # live at 310-313; tiny()'s 256 made embedding gathers OOB -> NaN)
    from rlaifv_tpu.models.llama import LlamaConfig

    cfg = MiniCPMVConfig.tiny()
    cfg = MiniCPMVConfig(
        llm=LlamaConfig.tiny(num_kv_heads=2, vocab_size=512),
        vision=cfg.vision,
        query_num=cfg.query_num,
        scale_resolution=cfg.scale_resolution,
        patch_size=cfg.patch_size,
    )
    model = MiniCPMVForCausalLM(cfg)
    tok = FakeTokenizer()
    size = cfg.vision.image_size
    Q = cfg.query_num

    ids = jnp.ones((1, Q + 8), jnp.int32)
    lm_params = model.init(
        jax.random.PRNGKey(0), ids,
        span_features=jnp.zeros((1, 1, Q, cfg.llm.hidden_size)),
        span_starts=jnp.asarray([[0]], jnp.int32),
    )["params"]
    vision_params = model.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, size, size, 3)),
        method=model.encode_slices,
    )["params"]
    params = {**lm_params, **vision_params}
    return cfg, MiniCPMVGenerator(model, params, tok, checkpoint_name="tiny")


def _items(n):
    rng = np.random.default_rng(0)
    return [{
        "question": f"Is it {i}? Please answer yes or no.",
        "question_id": i,
        "image": rng.integers(0, 255, size=(90, 60, 3), dtype=np.uint8),
        "metainfos": {"ds_question_id": f"ds{i}"},
    } for i in range(n)]


@pytest.mark.slow
def test_autocheck_with_slicing(gen):
    cfg, g = gen
    rows = g.autocheck(_items(2), batch_size=2)
    assert len(rows) == 2
    for r in rows:
        assert set(r["scores"]) == {"yes", "Yes", "no", "No"}
        assert all(0.0 <= v <= 1.0 for v in r["scores"].values())
        assert r["model_path"] == "tiny"


@pytest.mark.slow
def test_autocheck_shared_prefix_parity(gen):
    """Shared-prefix scoring (one slice encode + one prefix prefill per
    image) matches the plain per-fact full prefill."""
    cfg, g = gen
    items = _items(4)
    img = items[0]["image"]
    for it in items:
        it["image"] = img  # one image, many facts -> one shared group
    items[2]["question"] = ("Is there a very small red mark near the top "
                            "left corner? Please answer yes or no.")
    plain = g.autocheck(items, batch_size=2, shared_prefix=False)
    shared = g.autocheck(items, batch_size=2, shared_prefix=True)
    for a, b in zip(plain, shared):
        assert a["answer"] == b["answer"]
        for w in a["scores"]:
            assert abs(a["scores"][w] - b["scores"][w]) < 1e-4


@pytest.mark.slow
def test_diverse_gen(gen):
    cfg, g = gen
    rows = g.diverse_gen(_items(2), max_new_tokens=3, batch_size=2)
    assert len(rows) == 2 and all(isinstance(r["answer"], str) for r in rows)


@pytest.mark.slow
def test_prompt_has_spans(gen):
    cfg, g = gen
    ids, starts, slices = g._build_prompt(_items(1)[0])
    assert len(starts) == len(slices)
    # every span is exactly query_num unk tokens
    unk = g.unk_id
    for st in starts:
        assert all(t == unk for t in ids[st : st + cfg.query_num])


@pytest.fixture(scope="module")
def tiny_minicpmv_checkpoint(tmp_path_factory):
    """Real-format MiniCPM-V checkpoint dir: llm.*/vpm.*/resampler.* weights
    + config.json with the remote-code field names."""
    import json
    import os

    import torch
    from safetensors.torch import save_file
    from transformers import LlamaConfig as HFLC
    from transformers import LlamaForCausalLM as HFLlama
    from transformers import SiglipVisionConfig as HFSC
    from transformers import SiglipVisionModel as HFSiglip

    d = str(tmp_path_factory.mktemp("tiny_minicpmv"))
    torch.manual_seed(0)
    llm = HFLlama(HFLC(vocab_size=64, hidden_size=16, intermediate_size=32,
                       num_hidden_layers=2, num_attention_heads=2,
                       num_key_value_heads=2))
    vis = HFSiglip(HFSC(hidden_size=32, intermediate_size=64,
                        num_hidden_layers=2, num_attention_heads=4,
                        image_size=28, patch_size=7))
    sd = {}
    for k, v in llm.state_dict().items():
        sd["llm." + k] = v.clone()
    for k, v in vis.state_dict().items():
        sd["vpm." + k] = v.clone()
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
    save_file({k: v.contiguous() for k, v in sd.items()},
              os.path.join(d, "model.safetensors"))
    cfg = {
        "architectures": ["MiniCPMV"],
        "vocab_size": 64, "hidden_size": 16, "intermediate_size": 32,
        "num_hidden_layers": 2, "num_attention_heads": 2,
        "num_key_value_heads": 2, "max_position_embeddings": 512,
        "rope_theta": 500000.0, "rms_norm_eps": 1e-5,
        "query_num": 4, "slice_mode": True, "max_slice_nums": 9,
        "scale_resolution": 28, "patch_size": 7,
        "vision_config": {"image_size": 28, "patch_size": 7,
                          "hidden_size": 32, "intermediate_size": 64,
                          "num_hidden_layers": 2, "num_attention_heads": 4},
    }
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)
    return d


@pytest.mark.slow
def test_minicpmv_chat_from_checkpoint(tiny_minicpmv_checkpoint):
    from rlaifv_tpu.genai.minicpmv_gen import MiniCPMVChat

    chat = MiniCPMVChat(
        tiny_minicpmv_checkpoint, tokenizer=FakeTokenizer(), max_new_tokens=4
    )
    # geometry came from config.json, not the 2.5 defaults
    assert chat.gen.cfg.llm.hidden_size == 16
    assert chat.gen.cfg.query_num == 4
    assert chat.gen.cfg.scale_resolution == 28

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(90, 60, 3), dtype=np.uint8)
    out = chat.chat({"question": "what is shown?", "image": img})
    assert isinstance(out, str)


@pytest.mark.slow
def test_minicpmv_chat_int4(tiny_minicpmv_checkpoint):
    """--load-4bit routing for 2.5: the chat loads with an s4 LM base."""
    import jax.numpy as jnp

    from rlaifv_tpu.genai.minicpmv_gen import MiniCPMVChat

    chat = MiniCPMVChat(
        tiny_minicpmv_checkpoint, tokenizer=FakeTokenizer(),
        max_new_tokens=4, int4=True,
    )
    assert chat.gen.cfg.llm.quantize and chat.gen.cfg.llm.quantize_bits == 4
    qp = chat.gen.params["llm"]["model"]["layer_0"]["attn"]["q_proj"]
    assert qp["kernel"].dtype == jnp.int8  # nibble-packed (K/2, N)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(90, 60, 3), dtype=np.uint8)
    out = chat.chat({"question": "what is shown?", "image": img})
    assert isinstance(out, str)


def test_chat_cli_picks_minicpmv(tiny_minicpmv_checkpoint, monkeypatch):
    import chat as chat_mod

    captured = {}

    class _Stub:
        def __init__(self, path, **kw):
            captured["path"] = path

    monkeypatch.setattr(
        "rlaifv_tpu.genai.minicpmv_gen.MiniCPMVChat", _Stub
    )
    chat_mod.RLAIFVChat("/ckpts/MiniCPM-Llama3-V-2_5-iter3")
    assert captured["path"].endswith("MiniCPM-Llama3-V-2_5-iter3")


@pytest.mark.slow
def test_minicpmv_chat_int4_smooth(tiny_minicpmv_checkpoint):
    """int4_smooth: AWQ smoothing rides the 2.5 loader (calibration falls
    back to the id ramp when the fake tokenizer can't encode)."""
    import jax.numpy as jnp

    from rlaifv_tpu.genai.minicpmv_gen import MiniCPMVChat

    chat = MiniCPMVChat(
        tiny_minicpmv_checkpoint, tokenizer=FakeTokenizer(),
        max_new_tokens=4, int4=True, int4_smooth=True,
    )
    qp = chat.gen.params["llm"]["model"]["layer_0"]["attn"]["q_proj"]
    assert qp["kernel"].dtype == jnp.int8 and qp["scale"].ndim == 2
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(90, 60, 3), dtype=np.uint8)
    out = chat.chat({"question": "what is shown?", "image": img})
    assert isinstance(out, str)
