"""Continuous batching (slot-refill) parity vs plain generate.

Greedy decode is deterministic and batch-independent (per-row masking), so
the continuous engine must reproduce DecodeEngine.generate token-for-token
for every prompt regardless of slot scheduling, refills, write-column
advances, and cache compaction.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rlaifv_tpu.genai.continuous import ContinuousGenerator
from rlaifv_tpu.genai.engine import DecodeEngine
from rlaifv_tpu.genai.sampling import SamplingParams
from rlaifv_tpu.models.llama import LlamaConfig, LlamaForCausalLM
from rlaifv_tpu.models.llava import LlavaConfig, LlavaForCausalLM


@pytest.fixture(scope="module")
def tiny_lm():
    cfg = LlamaConfig.tiny()
    model = LlamaForCausalLM(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))[
        "params"
    ]
    return cfg, model, params


@pytest.fixture(scope="module")
def tiny_llava():
    cfg = LlavaConfig.tiny()
    model = LlavaForCausalLM(cfg)
    ids = jnp.ones((1, cfg.num_image_tokens + 8), jnp.int32)
    img = jnp.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3))
    params = model.init(
        jax.random.PRNGKey(0), ids, images=img, image_starts=jnp.asarray([0])
    )["params"]
    return cfg, model, params


def _reference(engine, prompts, sampling, max_new, **kw):
    """Per-prompt generate (batch of 1) — the ground truth each prompt's
    tokens must match under any scheduling."""
    toks, lens = [], []
    for i, p in enumerate(prompts):
        res = engine.generate(
            [p], sampling=sampling, max_new_tokens=max_new, prompt_bucket=8,
            **({k: (v[i : i + 1] if k == "images" else [v[i]])
                for k, v in kw.items()} if kw else {}),
        )
        toks.append(res.tokens[0])
        lens.append(res.lengths[0])
    return toks, lens


def _check(res, ref_toks, ref_lens, max_new):
    for i, (rt, rl) in enumerate(zip(ref_toks, ref_lens)):
        n = int(res.lengths[i])
        assert n == int(rl), f"prompt {i}: length {n} != {rl}"
        np.testing.assert_array_equal(
            res.tokens[i, :n], rt[:n], err_msg=f"prompt {i}"
        )
        assert (res.tokens[i, n:] == 0).all()


@pytest.mark.parametrize("slots,chunk", [(2, 4), (3, 8)])
def test_continuous_matches_generate_text(tiny_lm, slots, chunk):
    _, model, params = tiny_lm
    # eos_id=-1: rows always run to max_new; mixed lengths force refills
    engine = DecodeEngine(model, params, eos_id=-1, pad_id=0)
    rng = np.random.default_rng(0)
    prompts = [
        list(rng.integers(3, 200, size=n))
        for n in (13, 4, 22, 7, 3, 17, 9)
    ]
    sp = SamplingParams.greedy()
    max_new = 6

    gen = ContinuousGenerator(
        engine, slots=slots, chunk=chunk, max_new_tokens=max_new,
        sampling=sp, prompt_bucket=8,
    )
    res = gen.run(prompts)
    ref_toks, ref_lens = _reference(engine, prompts, sp, max_new)
    _check(res, ref_toks, ref_lens, max_new)


def test_continuous_eos_and_varied_finish(tiny_lm):
    """With a real eos id some rows stop early -> slots refill mid-flight."""
    _, model, params = tiny_lm
    rng = np.random.default_rng(1)
    # pick eos as the argmax token some prompt actually produces: probe once
    probe = DecodeEngine(model, params, eos_id=-1, pad_id=0)
    prompts = [list(rng.integers(3, 200, size=n)) for n in (11, 5, 19, 8, 6)]
    sp = SamplingParams.greedy()
    first = probe.generate(prompts[:1], sampling=sp, max_new_tokens=1,
                           prompt_bucket=8)
    eos = int(first.tokens[0, 0])

    engine = DecodeEngine(model, params, eos_id=eos, pad_id=0)
    max_new = 8
    gen = ContinuousGenerator(
        engine, slots=2, chunk=4, max_new_tokens=max_new,
        sampling=sp, prompt_bucket=8,
    )
    res = gen.run(prompts)
    ref_toks, ref_lens = _reference(engine, prompts, sp, max_new)
    _check(res, ref_toks, ref_lens, max_new)


def test_continuous_compaction_and_gt_advance(tiny_lm):
    """Tiny headroom forces compaction; a long queued prompt after short
    active rows forces the write-column advance path."""
    _, model, params = tiny_lm
    engine = DecodeEngine(model, params, eos_id=-1, pad_id=0)
    rng = np.random.default_rng(2)
    prompts = [
        list(rng.integers(3, 200, size=n))
        for n in (40, 4, 38, 37, 5, 36)
    ]
    sp = SamplingParams.greedy()
    max_new = 6
    gen = ContinuousGenerator(
        engine, slots=2, chunk=4, max_new_tokens=max_new,
        sampling=sp, prompt_bucket=8, headroom=8,
    )
    res = gen.run(prompts)
    ref_toks, ref_lens = _reference(engine, prompts, sp, max_new)
    _check(res, ref_toks, ref_lens, max_new)


def test_continuous_repetition_penalty(tiny_lm):
    """token_seen must reset per slot at refill: rep-penalty greedy decode is
    deterministic and must match per-prompt generate."""
    _, model, params = tiny_lm
    engine = DecodeEngine(model, params, eos_id=-1, pad_id=0)
    rng = np.random.default_rng(3)
    prompts = [list(rng.integers(3, 200, size=n)) for n in (10, 4, 15, 6)]
    sp = SamplingParams(do_sample=False, repetition_penalty=1.3)
    max_new = 6
    gen = ContinuousGenerator(
        engine, slots=2, chunk=4, max_new_tokens=max_new,
        sampling=sp, prompt_bucket=8,
    )
    res = gen.run(prompts)
    ref_toks, ref_lens = _reference(engine, prompts, sp, max_new)
    _check(res, ref_toks, ref_lens, max_new)


def test_continuous_multimodal(tiny_llava):
    cfg, model, params = tiny_llava
    engine = DecodeEngine(model, params, eos_id=-1, pad_id=0)
    P = cfg.num_image_tokens
    rng = np.random.default_rng(4)
    n_img = 3
    images = rng.normal(size=(
        n_img, cfg.vision.image_size, cfg.vision.image_size, 3
    )).astype(np.float32)

    prompts, starts = [], []
    for i, extra in enumerate((3, 7, 5)):
        body = list(rng.integers(3, 200, size=extra))
        # patch-slot sentinels occupy [1, 1+P)
        prompts.append([1] + [-2] * P + body)
        starts.append(1)

    sp = SamplingParams.greedy()
    max_new = 5
    gen = ContinuousGenerator(
        engine, slots=2, chunk=4, max_new_tokens=max_new,
        sampling=sp, prompt_bucket=8,
    )
    res = gen.run(prompts, images=images, image_starts=starts)
    ref_toks, ref_lens = _reference(
        engine, prompts, sp, max_new, images=images, image_starts=starts
    )
    _check(res, ref_toks, ref_lens, max_new)
