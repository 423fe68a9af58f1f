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
