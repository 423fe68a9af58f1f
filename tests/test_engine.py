"""Decode engine: greedy equals argmax-rollout; sampling/eos/multimodal paths."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rlaifv_tpu.constants import IMAGE_TOKEN_INDEX
from rlaifv_tpu.data.multimodal import expand_image_sentinels
from rlaifv_tpu.genai.engine import DecodeEngine, left_pad_batch
from rlaifv_tpu.genai.sampling import (
    SamplingParams,
    apply_top_k,
    apply_top_p,
    yesno_probs,
)
from rlaifv_tpu.models.llava import LlavaConfig, LlavaForCausalLM


@pytest.fixture(scope="module")
def tiny_llava():
    cfg = LlavaConfig.tiny()
    model = LlavaForCausalLM(cfg)
    ids = jnp.ones((1, cfg.num_image_tokens + 8), jnp.int32)
    img = jnp.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3))
    params = model.init(
        jax.random.PRNGKey(0), ids, images=img,
        image_starts=jnp.asarray([0]),
    )["params"]
    return cfg, model, params


def test_left_pad_batch():
    ids, mask = left_pad_batch([[1, 2, 3], [4, 5]], pad_id=0)
    np.testing.assert_array_equal(ids, [[1, 2, 3], [0, 4, 5]])
    np.testing.assert_array_equal(mask, [[1, 1, 1], [0, 1, 1]])


def test_top_k_top_p():
    logits = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
    out = apply_top_k(logits, 2)
    assert np.asarray(out)[0, 0] < -1e9 and np.asarray(out)[0, 3] == 4.0
    out = apply_top_p(logits, 0.5)
    # only the top token needed to reach p=0.5 at these gaps
    kept = np.asarray(out)[0] > -1e9
    assert kept[3] and not kept[0]


@pytest.mark.slow
def test_greedy_matches_manual_rollout(tiny_llava):
    cfg, model, params = tiny_llava
    engine = DecodeEngine(model, params, eos_id=-1, pad_id=0)  # no early stop
    prompts = [[1, 7, 8, 9], [1, 5, 6]]
    res = engine.generate(
        prompts, sampling=SamplingParams.greedy(), max_new_tokens=5,
        prompt_bucket=4,
    )

    # manual rollout per sequence (no cache, full forward each step)
    for b, prompt in enumerate(prompts):
        seq = list(prompt)
        for t in range(5):
            logits, _ = model.apply(
                {"params": params}, jnp.asarray([seq], jnp.int32)
            )
            nxt = int(jnp.argmax(logits[0, -1]))
            assert nxt == res.tokens[b, t], f"b={b} t={t}"
            seq.append(nxt)


def test_eos_stops_row(tiny_llava):
    cfg, model, params = tiny_llava
    # force eos to be whatever greedy emits at step 0 for row 0
    engine0 = DecodeEngine(model, params, eos_id=-1, pad_id=0)
    probe = engine0.generate([[1, 7, 8, 9]], max_new_tokens=1, prompt_bucket=4)
    eos = int(probe.tokens[0, 0])

    engine = DecodeEngine(model, params, eos_id=eos, pad_id=0)
    res = engine.generate([[1, 7, 8, 9]], max_new_tokens=4, prompt_bucket=4)
    assert res.lengths[0] == 1
    assert (res.tokens[0, 1:] == 0).all()


def test_multimodal_generate(tiny_llava):
    cfg, model, params = tiny_llava
    P = cfg.num_image_tokens
    ex = expand_image_sentinels([1, 5, IMAGE_TOKEN_INDEX, 6, 7], None, P)
    rng = np.random.default_rng(0)
    img = rng.normal(size=(1, cfg.vision.image_size, cfg.vision.image_size, 3)
                     ).astype(np.float32)

    engine = DecodeEngine(model, params, eos_id=-1, pad_id=0)
    res = engine.generate(
        [ex["input_ids"].tolist()],
        images=img,
        image_starts=[int(ex["image_start"])],
        max_new_tokens=3,
        prompt_bucket=8,
    )
    assert res.tokens.shape == (1, 3)
    assert np.isfinite(res.first_logits).all()


def test_yesno_probs():
    logits = jnp.asarray([[0.0, 2.0, 1.0, -1.0]])
    out = yesno_probs(logits, yes_ids=[1], no_ids=[2])
    assert float(out["yes"][0]) > float(out["no"][0])
    total = float(out["yes"][0] + out["no"][0])
    assert 0 < total <= 1.0


def test_sampling_reproducible(tiny_llava):
    cfg, model, params = tiny_llava
    engine = DecodeEngine(model, params, eos_id=-1, pad_id=0)
    sp = SamplingParams(temperature=0.7, top_k=30, top_p=0.9,
                        repetition_penalty=1.1)
    r1 = engine.generate([[1, 7, 8]], sampling=sp, max_new_tokens=4, seed=7,
                         prompt_bucket=4)
    r2 = engine.generate([[1, 7, 8]], sampling=sp, max_new_tokens=4, seed=7,
                         prompt_bucket=4)
    r3 = engine.generate([[1, 7, 8]], sampling=sp, max_new_tokens=4, seed=8,
                         prompt_bucket=4)
    np.testing.assert_array_equal(r1.tokens, r2.tokens)
    assert not np.array_equal(r1.tokens, r3.tokens) or True  # may collide


@pytest.mark.slow
def test_fused_decode_engine_matches_per_layer():
    """Engine with fused_decode=True reproduces the per-layer greedy tokens
    (tiny MHA int8 fused-proj config; kernel runs in interpret on CPU)."""
    from rlaifv_tpu.models.llama import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig.tiny(quantize=True, quantize_lm_head=False,
                           fuse_proj=True, kv_cache_dtype="int8",
                           num_kv_heads=4)
    model = LlamaForCausalLM(cfg)
    ids = jnp.ones((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)["params"]

    prompts = [[1, 7, 8, 9, 3], [1, 5, 6]]
    kw = dict(sampling=SamplingParams.greedy(), max_new_tokens=6,
              prompt_bucket=4)
    base = DecodeEngine(model, params, eos_id=-1, pad_id=0)
    want = base.generate(prompts, **kw)
    fused = DecodeEngine(model, params, eos_id=-1, pad_id=0,
                         fused_decode=True)
    got = fused.generate(prompts, **kw)
    np.testing.assert_array_equal(got.tokens, want.tokens)
    np.testing.assert_array_equal(got.lengths, want.lengths)


@pytest.mark.slow
def test_fused_decode_engine_int4_matches_per_layer():
    """Engine with fused_decode=True over a packed-int4 base reproduces the
    per-layer (flax QuantDense bits=4) greedy tokens."""
    from rlaifv_tpu.models.convert import (
        fuse_llm_projections,
        quantize_llm_int4,
    )
    from rlaifv_tpu.models.llama import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig.tiny(quantize=True, quantize_bits=4,
                           quantize_lm_head=False, fuse_proj=True,
                           kv_cache_dtype="int8", num_kv_heads=4)
    fmodel = LlamaForCausalLM(LlamaConfig.tiny(num_kv_heads=4))
    fparams = fmodel.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))[
        "params"]
    params = jax.tree.map(
        jnp.asarray, fuse_llm_projections(quantize_llm_int4(fparams))
    )
    model = LlamaForCausalLM(cfg)

    prompts = [[1, 7, 8, 9, 3], [1, 5, 6]]
    kw = dict(sampling=SamplingParams.greedy(), max_new_tokens=6,
              prompt_bucket=4)
    base = DecodeEngine(model, params, eos_id=-1, pad_id=0)
    want = base.generate(prompts, **kw)
    fused = DecodeEngine(model, params, eos_id=-1, pad_id=0,
                         fused_decode=True)
    got = fused.generate(prompts, **kw)
    np.testing.assert_array_equal(got.tokens, want.tokens)
    np.testing.assert_array_equal(got.lengths, want.lengths)


def test_fused_decode_engine_rejects_unsupported():
    from rlaifv_tpu.models.llama import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig.tiny()  # no quantize / GQA
    model = LlamaForCausalLM(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 4), jnp.int32))[
        "params"]
    with pytest.raises(ValueError, match="fused_decode"):
        DecodeEngine(model, params, fused_decode=True)
