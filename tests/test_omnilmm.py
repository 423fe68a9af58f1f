"""OmniLMM family: resampled splice forward, omni_preprocess masking."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rlaifv_tpu.constants import IGNORE_INDEX
from rlaifv_tpu.data.preprocess import omni_preprocess
from rlaifv_tpu.models.omnilmm import (
    OmniLMMConfig,
    OmniLMMForCausalLM,
    find_image_start,
)
from tests.fake_tokenizer import FakeTokenizer


@pytest.fixture(scope="module")
def tiny_omni():
    cfg = OmniLMMConfig.tiny()
    model = OmniLMMForCausalLM(cfg)
    size = cfg.vision.image_size
    ids = jnp.ones((1, cfg.num_query + 8), jnp.int32)
    params = model.init(
        jax.random.PRNGKey(0), ids,
        images=jnp.zeros((1, size, size, 3)),
        image_starts=jnp.asarray([1]),
    )["params"]
    return cfg, model, params


def test_omni_forward_shapes(tiny_omni):
    cfg, model, params = tiny_omni
    size = cfg.vision.image_size
    B, L = 2, cfg.num_query + 10
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(4, cfg.llm.vocab_size, size=(B, L)))
    imgs = jnp.asarray(rng.normal(size=(B, size, size, 3)).astype(np.float32))
    starts = jnp.asarray([2, 3])

    logits, _ = model.apply(
        {"params": params}, ids, images=imgs, image_starts=starts
    )
    assert logits.shape == (B, L, cfg.llm.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_omni_vision_feature_count(tiny_omni):
    cfg, model, params = tiny_omni
    size = cfg.vision.image_size
    feats = model.apply(
        {"params": params}, jnp.zeros((1, size, size, 3)),
        method=model.encode_images,
    )
    assert feats.shape == (1, cfg.num_query, cfg.llm.hidden_size)


def test_find_image_start():
    assert find_image_start([5, 6, 99, 99, 7], 99) == 2
    assert find_image_start([5, 6, 7], 99) == -1


def test_omni_preprocess_masks_instructions():
    tok = FakeTokenizer()
    source = [
        {"from": "human", "value": "What is shown?"},
        {"from": "gpt", "value": "A red car."},
        {"from": "human", "value": "Where?"},
        {"from": "gpt", "value": "On a road."},
    ]
    out = omni_preprocess([source], tok)
    ids, labels = out["input_ids"][0], out["labels"][0]
    assert len(ids) == len(labels)

    # decode supervised positions: responses must be supervised, the
    # questions and system prompt must not
    sup = tok.decode([i for i, l in zip(ids, labels) if l != IGNORE_INDEX])
    assert "A red car." in sup
    assert "On a road." in sup
    assert "What is shown?" not in sup
    assert "system" not in sup.lower() or "polite answers" not in sup

    unsup = tok.decode([i for i, l in zip(ids, labels) if l == IGNORE_INDEX])
    assert "What is shown?" in unsup
    assert "Where?" in unsup


def test_omni_preprocess_generation_prompt():
    tok = FakeTokenizer()
    source = [{"from": "human", "value": "Q?"}]
    out = omni_preprocess([source], tok, generation=True)
    text = tok.decode(out["input_ids"][0])
    assert text.rstrip().endswith("<|assistant|>")


def test_int8_vision_tower_close_to_float():
    """quantize_vision_int8 + EvaConfig(quantize=True): the int8 tower
    tracks the float tower within weight-quantization error, biases kept."""
    import dataclasses

    from rlaifv_tpu.models.convert import quantize_vision_int8
    from rlaifv_tpu.models.eva02 import EvaConfig, EvaVisionTower

    cfg = EvaConfig.tiny()
    tower = EvaVisionTower(cfg)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((2, 28, 28, 3)), jnp.float32)
    params = tower.init(jax.random.PRNGKey(0), img)["params"]
    params = jax.tree.map(lambda a: a * 2.0, params)

    qparams = quantize_vision_int8(jax.tree.map(np.asarray, params))
    qtower = EvaVisionTower(dataclasses.replace(cfg, quantize=True))
    got = qtower.apply({"params": jax.tree.map(jnp.asarray, qparams)}, img)

    # exact spec: the int8 path equals a float tower running the
    # DEQUANTIZED weights (per-layer quantization error is a modeling
    # choice; the dequantized-weight equivalence is what must hold)
    def dequant(node, name=""):
        if isinstance(node, dict):
            if "scale" in node and isinstance(node.get("kernel"), np.ndarray) \
                    and node["kernel"].dtype == np.int8:
                out = {"kernel": node["kernel"].astype(np.float32)
                       * node["scale"][None, :]}
                if "bias" in node:
                    out["bias"] = node["bias"]
                return out
            return {k: dequant(v, k) for k, v in node.items()}
        return node

    want = tower.apply(
        {"params": jax.tree.map(jnp.asarray, dequant(qparams))}, img
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )
    # biases survived quantization (qkv has one, k_proj path unused here)
    assert "bias" in qparams["block_0"]["attn"]["qkv"]
    assert qparams["block_0"]["attn"]["qkv"]["kernel"].dtype == np.int8


def test_omnilmm_int8_serving_engine():
    """Full OmniLMM int8 serving config (int8 LM + int8 KV + int8 tower)
    drives the decode engine end-to-end at tiny geometry."""
    import dataclasses

    from rlaifv_tpu.genai.engine import DecodeEngine
    from rlaifv_tpu.genai.sampling import SamplingParams
    from rlaifv_tpu.models.convert import quantize_llm_int8, quantize_vision_int8
    from rlaifv_tpu.models.eva02 import EvaConfig
    from rlaifv_tpu.models.llama import LlamaConfig
    from rlaifv_tpu.models.omnilmm import OmniLMMConfig, OmniLMMForCausalLM

    cfg = OmniLMMConfig.tiny()
    model = OmniLMMForCausalLM(cfg)
    T = cfg.num_image_tokens
    ids = jnp.ones((1, T + 6), jnp.int32)
    img = jnp.zeros((1, 28, 28, 3))
    params = model.init(jax.random.PRNGKey(0), ids, images=img,
                        image_starts=jnp.asarray([1]))["params"]

    qcfg = OmniLMMConfig(
        llm=dataclasses.replace(cfg.llm, quantize=True,
                                quantize_lm_head=False,
                                kv_cache_dtype="int8"),
        vision=dataclasses.replace(cfg.vision, quantize=True),
        num_query=cfg.num_query,
    )
    qparams = {
        "llm": quantize_llm_int8(params["llm"], include_lm_head=False),
        "vision_tower": quantize_vision_int8(
            jax.tree.map(np.asarray, params["vision_tower"])
        ),
        "resampler": params["resampler"],
    }
    qmodel = OmniLMMForCausalLM(qcfg)
    engine = DecodeEngine(qmodel, jax.tree.map(jnp.asarray, qparams),
                          eos_id=-1, pad_id=0)
    prompts = [[3] + [0] * T + [5, 7], [2] + [0] * T + [9]]
    images = np.zeros((2, 28, 28, 3), np.float32)
    res = engine.generate(
        prompts, images=images, image_starts=[1, 1],
        sampling=SamplingParams.greedy(), max_new_tokens=4, prompt_bucket=8,
    )
    assert res.tokens.shape == (2, 4)
    assert np.isfinite(np.asarray(res.first_logits, np.float32)).all()


@pytest.mark.slow
@pytest.mark.parametrize("bits", [8, 4])
def test_omnilmm_fused_decode_engine(bits):
    """The 12B labeler's decode rides the multi-layer fused kernel: the
    Mistral-family stack is llama-shaped (GQA), so DecodeEngine's
    fused_decode works unchanged for the multimodal model — greedy tokens
    must match the per-layer path for both the int8 and int4 bases."""
    import dataclasses

    from rlaifv_tpu.genai.engine import DecodeEngine
    from rlaifv_tpu.genai.sampling import SamplingParams
    from rlaifv_tpu.models.convert import (
        fuse_llm_projections,
        quantize_llm_int4,
        quantize_llm_int8,
    )
    from rlaifv_tpu.models.omnilmm import OmniLMMConfig, OmniLMMForCausalLM

    cfg = OmniLMMConfig.tiny()
    model = OmniLMMForCausalLM(cfg)
    T = cfg.num_image_tokens
    ids = jnp.ones((1, T + 6), jnp.int32)
    img = jnp.zeros((1, 28, 28, 3))
    params = model.init(jax.random.PRNGKey(0), ids, images=img,
                        image_starts=jnp.asarray([1]))["params"]

    quant = (quantize_llm_int8 if bits == 8
             else lambda p: quantize_llm_int4(p))
    qcfg = OmniLMMConfig(
        llm=dataclasses.replace(cfg.llm, quantize=True, quantize_bits=bits,
                                quantize_lm_head=False,
                                kv_cache_dtype="int8", fuse_proj=True),
        vision=cfg.vision,
        num_query=cfg.num_query,
    )
    qllm = fuse_llm_projections(
        quant(jax.tree.map(np.asarray, params["llm"]))
    )
    qparams = jax.tree.map(jnp.asarray, {
        "llm": qllm,
        "vision_tower": params["vision_tower"],
        "resampler": params["resampler"],
    })
    qmodel = OmniLMMForCausalLM(qcfg)

    prompts = [[3] + [0] * T + [5, 7], [2] + [0] * T + [9]]
    images = np.zeros((2, 28, 28, 3), np.float32)
    kw = dict(images=images, image_starts=[1, 1],
              sampling=SamplingParams.greedy(), max_new_tokens=4,
              prompt_bucket=8)

    want = DecodeEngine(qmodel, qparams, eos_id=-1, pad_id=0).generate(
        prompts, **kw
    )
    fused = DecodeEngine(qmodel, jax.tree.map(jnp.copy, qparams),
                         eos_id=-1, pad_id=0, fused_decode=True)
    got = fused.generate(prompts, **kw)
    np.testing.assert_array_equal(got.tokens, want.tokens)
    np.testing.assert_array_equal(got.lengths, want.lengths)
