"""Prompt-lookup speculative decoding: greedy-exactness + acceptance.

The whole value proposition is "same tokens, fewer steps": greedy output
must be TOKEN-IDENTICAL to the engine's plain greedy decode (acceptance
only changes speed). These tests run the per-layer bf16-KV path on CPU.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rlaifv_tpu.genai.engine import DecodeEngine
from rlaifv_tpu.genai.lookup_decode import lookup_generate
from rlaifv_tpu.genai.sampling import SamplingParams
from rlaifv_tpu.models.llama import LlamaConfig, LlamaForCausalLM


def _engine(seed=0, **cfg_kw):
    cfg = LlamaConfig.tiny(**cfg_kw)
    model = LlamaForCausalLM(cfg)
    ids = jnp.ones((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(seed), ids)["params"]
    return cfg, DecodeEngine(model, params, eos_id=-1, pad_id=0)


def _greedy_reference(engine, prompt, max_new):
    got = engine.generate([prompt], sampling=SamplingParams.greedy(),
                          max_new_tokens=max_new, prompt_bucket=8)
    toks = [int(t) for t in got.tokens[0][: int(got.lengths[0])]]
    return toks


@pytest.mark.parametrize("ngram,k", [pytest.param(2, 4, marks=pytest.mark.slow),
                                     (3, 8)])
def test_lookup_matches_plain_greedy(ngram, k):
    cfg, engine = _engine()
    rng = np.random.default_rng(5)
    prompt = list(map(int, rng.integers(5, cfg.vocab_size - 1, size=13)))

    want = _greedy_reference(engine, prompt, 24)
    got = lookup_generate(engine, prompt, max_new_tokens=24,
                          draft_len=k, ngram=ngram)
    assert got.tokens == want
    assert got.n_steps >= 1


@pytest.mark.slow
def test_lookup_accepts_on_repetitive_prompt():
    """A prompt that forces the model into a copyable loop must yield
    acceptance > 1 token/step — the mechanism actually fires (a tiny
    random model often falls into cycles, which lookup then drafts)."""
    cfg, engine = _engine(seed=3)
    rng = np.random.default_rng(9)
    base = list(map(int, rng.integers(5, cfg.vocab_size - 1, size=6)))
    prompt = (base * 5)[:28]  # heavy n-gram repetition

    want = _greedy_reference(engine, prompt, 32)
    got = lookup_generate(engine, prompt, max_new_tokens=32, draft_len=8,
                          ngram=2)
    assert got.tokens == want
    # steps never exceed plain decoding's token count, and on a cyclic
    # continuation they should be strictly fewer
    assert got.n_steps <= max(len(want), 1)
    if len(want) == 32:  # generation actually cycled to the cap
        assert got.tokens_per_step > 1.0


def test_lookup_rejects_fused_engine():
    cfg = LlamaConfig.tiny(quantize=True, quantize_lm_head=False,
                           fuse_proj=True, kv_cache_dtype="int8")
    model = LlamaForCausalLM(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 4), jnp.int32))
    with pytest.raises(ValueError, match="per-layer"):
        eng = DecodeEngine.__new__(DecodeEngine)
        eng.fused_decode = True
        lookup_generate(eng, [1, 2, 3])


@pytest.mark.slow
def test_lookup_eos_truncation():
    """When greedy hits EOS, lookup emits exactly the same prefix."""
    cfg, engine = _engine(seed=1)
    # pick the most likely first token as the eos id so EOS fires early
    rng = np.random.default_rng(2)
    prompt = list(map(int, rng.integers(5, cfg.vocab_size - 1, size=10)))
    probe = _greedy_reference(engine, prompt, 8)
    if not probe:
        pytest.skip("model emitted nothing")
    eos = probe[min(2, len(probe) - 1)]

    engine2 = DecodeEngine(engine.model, engine.params, eos_id=eos, pad_id=0)
    want = _greedy_reference(engine2, prompt, 16)
    got = lookup_generate(engine2, prompt, max_new_tokens=16, draft_len=4,
                          ngram=2)
    assert got.tokens == want


@pytest.mark.slow
def test_lookup_multimodal_matches_plain_greedy():
    """Vision prompt: the spliced-embedding prefill feeds the same window
    loop; tokens must match the engine's plain greedy decode."""
    from rlaifv_tpu.data.multimodal import expand_image_sentinels
    from rlaifv_tpu.models.llava import LlavaConfig, LlavaForCausalLM

    cfg = LlavaConfig.tiny()
    model = LlavaForCausalLM(cfg)
    P = cfg.num_image_tokens
    ids0 = jnp.ones((1, P + 8), jnp.int32)
    img0 = jnp.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3))
    params = model.init(jax.random.PRNGKey(0), ids0, images=img0,
                        image_starts=jnp.asarray([0]))["params"]
    engine = DecodeEngine(model, params, eos_id=-1, pad_id=0)

    ex = expand_image_sentinels([1, 5, -200, 6, 7], None, P)
    rng = np.random.default_rng(0)
    img = rng.normal(
        size=(1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    prompt = ex["input_ids"].tolist()
    starts = [int(ex["image_start"])]

    want = engine.generate([prompt], images=img, image_starts=starts,
                           sampling=SamplingParams.greedy(),
                           max_new_tokens=12,
                           prompt_bucket=len(prompt))
    want_toks = [int(t) for t in want.tokens[0][: int(want.lengths[0])]]

    got = lookup_generate(engine, prompt, images=img, image_starts=starts,
                          max_new_tokens=12, draft_len=4, ngram=2)
    assert got.tokens == want_toks


@pytest.mark.slow
def test_lookup_short_prompt_edge():
    """Prompt shorter than the n-gram: lookup degrades to plain greedy
    (no match possible) without shape errors."""
    cfg, engine = _engine(seed=4)
    prompt = [7, 9]  # shorter than ngram=3
    want = _greedy_reference(engine, prompt, 6)
    got = lookup_generate(engine, prompt, max_new_tokens=6, draft_len=4,
                          ngram=3)
    assert got.tokens == want


def test_spec_accept_resample_preserves_distribution():
    """Monte Carlo on the speculative-sampling primitive: with a point
    draft d, the FIRST emitted token (accepted d or the residual
    resample) must be distributed exactly as softmax(filtered logits) —
    the Leviathan/Chen guarantee that speculation never changes sampling
    quality."""
    from rlaifv_tpu.genai.lookup_decode import _spec_accept_resample

    V, k = 8, 3
    rng = np.random.default_rng(0)
    fl = jnp.asarray(rng.normal(0, 1.5, size=(k + 1, V)), jnp.float32)
    p0 = np.asarray(jax.nn.softmax(fl[0]))
    draft = jnp.asarray([2, 5, 1], jnp.int32)

    @jax.jit
    @jax.vmap
    def one(key):
        a, new_p = _spec_accept_resample(key, fl, draft, eos_id=-1)
        # first emitted token: draft[0] if accepted (a >= 1) else new_p
        return jnp.where(a >= 1, draft[0], new_p)

    n = 40000
    keys = jax.random.split(jax.random.PRNGKey(7), n)
    toks = np.asarray(one(keys))
    emp = np.bincount(toks, minlength=V) / n
    tv = 0.5 * np.abs(emp - p0).sum()
    assert tv < 0.02, (tv, emp, p0)


def test_spec_no_draft_is_plain_sampling():
    """draft = -1 (no proposal): a == 0 and the resample is unmasked —
    plain sampling from p_0."""
    from rlaifv_tpu.genai.lookup_decode import _spec_accept_resample

    V, k = 6, 2
    fl = jnp.asarray(np.random.default_rng(1).normal(size=(k + 1, V)),
                     jnp.float32)
    p0 = np.asarray(jax.nn.softmax(fl[0]))
    draft = jnp.full((k,), -1, jnp.int32)

    @jax.jit
    @jax.vmap
    def one(key):
        a, new_p = _spec_accept_resample(key, fl, draft, eos_id=-1)
        return a * 100 + new_p

    out = np.asarray(one(jax.random.split(jax.random.PRNGKey(3), 20000)))
    assert (out < 100).all()  # a == 0 always
    emp = np.bincount(out, minlength=V) / len(out)
    assert 0.5 * np.abs(emp - p0).sum() < 0.02


def test_lookup_sampling_end_to_end_deterministic():
    """Sampled lookup decode runs end-to-end, is deterministic per seed,
    and differs across seeds (it actually samples)."""
    cfg, engine = _engine(seed=2)
    rng = np.random.default_rng(4)
    base = list(map(int, rng.integers(5, cfg.vocab_size - 1, size=5)))
    prompt = (base * 4)[:18]
    sp = SamplingParams(temperature=0.8, top_p=0.95)

    a = lookup_generate(engine, prompt, max_new_tokens=16, draft_len=4,
                        ngram=2, sampling=sp, seed=11)
    b = lookup_generate(engine, prompt, max_new_tokens=16, draft_len=4,
                        ngram=2, sampling=sp, seed=11)
    c = lookup_generate(engine, prompt, max_new_tokens=16, draft_len=4,
                        ngram=2, sampling=sp, seed=12)
    assert a.tokens == b.tokens
    assert len(a.tokens) > 0 and a.n_steps >= 1
    assert a.tokens != c.tokens or a.n_steps != c.n_steps

    with pytest.raises(ValueError, match="repetition_penalty"):
        lookup_generate(engine, prompt, sampling=SamplingParams(
            temperature=0.7, repetition_penalty=1.1))
