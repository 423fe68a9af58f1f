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
    cfg = OmniLMMConfig.tiny()
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
        assert r["ds_question_id"].startswith("ds")


def test_omni_diverse_gen(omni_gen):
    cfg, gen, tok = omni_gen
    rows = gen.diverse_gen(_items(cfg, 2), max_new_tokens=3, batch_size=2)
    assert len(rows) == 2 and all("answer" in r for r in rows)
