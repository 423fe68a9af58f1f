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
    cfg = MiniCPMVConfig.tiny()
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


def test_autocheck_with_slicing(gen):
    cfg, g = gen
    rows = g.autocheck(_items(2), batch_size=2)
    assert len(rows) == 2
    for r in rows:
        assert set(r["scores"]) == {"yes", "Yes", "no", "No"}
        assert r["model_path"] == "tiny"


def test_diverse_gen(gen):
    cfg, g = gen
    rows = g.diverse_gen(_items(2), max_new_tokens=3, batch_size=2)
    assert len(rows) == 2 and all(isinstance(r["answer"], str) for r in rows)


def test_prompt_has_spans(gen):
    cfg, g = gen
    ids, starts, slices = g._build_prompt(_items(1)[0])
    assert len(starts) == len(slices)
    # every span is exactly query_num unk tokens
    unk = g.unk_id
    for st in starts:
        assert all(t == unk for t in ids[st : st + cfg.query_num])
