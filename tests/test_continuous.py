"""Continuous batching (slot-refill) parity vs plain generate.

Greedy decode is deterministic and batch-independent (per-row masking), so
the continuous engine must reproduce DecodeEngine.generate token-for-token
for every prompt regardless of slot scheduling, refills, write-column
advances, and cache compaction.
"""
import numpy as np
import pytest

pytestmark = pytest.mark.slow
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


def test_continuous_per_prompt_budgets(tiny_lm):
    """max_new_per_prompt stops each row at its own budget and the emitted
    tokens still match the reference rollout prefix."""
    _, model, params = tiny_lm
    engine = DecodeEngine(model, params, eos_id=-1, pad_id=0)
    rng = np.random.default_rng(5)
    prompts = [list(rng.integers(3, 200, size=n)) for n in (9, 5, 14, 7)]
    budgets = [3, 7, 1, 5]
    sp = SamplingParams.greedy()
    gen = ContinuousGenerator(
        engine, slots=2, chunk=4, max_new_tokens=8,
        sampling=sp, prompt_bucket=8,
    )
    res = gen.run(prompts, max_new_per_prompt=budgets)
    ref_toks, _ = _reference(engine, prompts, sp, 8)
    for i, b in enumerate(budgets):
        assert int(res.lengths[i]) == b
        np.testing.assert_array_equal(res.tokens[i, :b], ref_toks[i][:b])


def test_continuous_spans(tiny_llava):
    """Pre-encoded multi-span features (MiniCPM-V slice path) through the
    continuous engine match per-prompt generate."""
    cfg, model, params = tiny_llava
    engine = DecodeEngine(model, params, eos_id=-1, pad_id=0)
    D = cfg.llm.hidden_size
    Q = 4  # span length in tokens
    rng = np.random.default_rng(6)
    N, S = 3, 2
    span_features = rng.normal(size=(N, S, Q, D)).astype(np.float32) * 0.1
    prompts, span_starts = [], np.full((N, S), -1, np.int32)
    for i, extra in enumerate((6, 3, 9)):
        body = list(rng.integers(3, 200, size=extra))
        prompts.append([1] + [-2] * Q + body + [-2] * Q + [5])
        span_starts[i, 0] = 1
        span_starts[i, 1] = 1 + Q + extra

    sp = SamplingParams.greedy()
    max_new = 5
    gen = ContinuousGenerator(
        engine, slots=2, chunk=4, max_new_tokens=max_new,
        sampling=sp, prompt_bucket=8,
    )
    res = gen.run(prompts, span_features=span_features,
                  span_starts=span_starts)

    for i in range(N):
        ref = engine.generate(
            [prompts[i]], span_features=span_features[i : i + 1],
            span_starts=span_starts[i : i + 1], sampling=sp,
            max_new_tokens=max_new, prompt_bucket=8,
        )
        n = int(res.lengths[i])
        assert n == int(ref.lengths[0])
        np.testing.assert_array_equal(res.tokens[i, :n], ref.tokens[0][:n])


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


def test_continuous_with_int8_kv_cache(tiny_lm):
    """The continuous engine's cache scatter/roll are rank-generic, so the
    int8 cache ({k, k_scale, v, v_scale} with 3-D scale leaves) schedules
    identically. Greedy tokens must match the plain-generate int8-cache
    engine exactly (same cache dtype on both sides — only scheduling
    differs)."""
    import dataclasses

    cfg, _, params = tiny_lm
    qcfg = dataclasses.replace(cfg, kv_cache_dtype="int8")
    model = LlamaForCausalLM(qcfg)
    engine = DecodeEngine(model, params)
    rng = np.random.default_rng(5)
    prompts = [
        list(map(int, rng.integers(5, cfg.vocab_size - 1, size=n)))
        for n in (5, 9, 3, 7, 6)
    ]
    sp = SamplingParams.greedy()
    max_new = 10
    gen = ContinuousGenerator(
        engine, slots=2, chunk=2, max_new_tokens=max_new,
        sampling=sp, prompt_bucket=8,
    )
    res = gen.run(prompts)
    ref_toks, ref_lens = _reference(engine, prompts, sp, max_new)
    _check(res, ref_toks, ref_lens, max_new)


@pytest.mark.slow
def test_continuous_fused_decode():
    """Fused multi-layer decode under continuous batching: refills scatter
    into the stacked h-major cache, compaction rolls its column axis, and
    greedy tokens match the per-layer continuous engine exactly (CPU
    interpret; hardware parity in run_tpu_checks/bench_7b_gen)."""
    cfg = LlamaConfig.tiny(quantize=True, quantize_lm_head=False,
                           fuse_proj=True, kv_cache_dtype="int8")  # GQA
    model = LlamaForCausalLM(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))[
        "params"]
    rng = np.random.default_rng(7)
    prompts = [
        list(map(int, rng.integers(5, cfg.vocab_size - 1, size=n)))
        for n in (5, 9, 3, 7, 6)
    ]
    sp = SamplingParams.greedy()
    max_new = 8
    base = DecodeEngine(model, params)
    want = ContinuousGenerator(
        base, slots=2, chunk=2, max_new_tokens=max_new, sampling=sp,
        prompt_bucket=8,
    ).run(prompts)
    fused = DecodeEngine(model, params, fused_decode=True)
    got = ContinuousGenerator(
        fused, slots=2, chunk=2, max_new_tokens=max_new, sampling=sp,
        prompt_bucket=8,
    ).run(prompts)
    np.testing.assert_array_equal(got.tokens, want.tokens)
    np.testing.assert_array_equal(got.lengths, want.lengths)


# ----------------------------------------------- shared-repeat refill

def test_continuous_share_keys_greedy_parity(tiny_lm):
    """share_keys with repeat-expanded prompts (the diverse-gen layout)
    must schedule through the window-prefill + broadcast-scatter path and
    still reproduce plain generate token-for-token (greedy)."""
    _, model, params = tiny_lm
    engine = DecodeEngine(model, params, eos_id=-1, pad_id=0)
    rng = np.random.default_rng(7)
    base = [list(map(int, rng.integers(3, 200, size=n))) for n in (11, 6, 9)]
    # 4 repeats of each question + one singleton (distinct key) at the end
    prompts, keys = [], []
    for q, p in enumerate(base):
        for _ in range(4):
            prompts.append(list(p))
            keys.append(q)
    prompts.append(list(map(int, rng.integers(3, 200, size=5))))
    keys.append("solo")

    sp = SamplingParams.greedy()
    max_new = 6
    gen = ContinuousGenerator(
        engine, slots=3, chunk=4, max_new_tokens=max_new,
        sampling=sp, prompt_bucket=8,
    )
    # count actual window prefills: stragglers (group size 4 > slots 3)
    # must reuse the saved window instead of re-prefilling
    n_prefills = [0]
    orig = gen._build_window_prefill

    def counting(Lp, mode):
        fn = orig(Lp, mode)

        def wrapped(*a, **kw):
            n_prefills[0] += 1
            return fn(*a, **kw)

        return wrapped

    gen._build_window_prefill = counting
    res = gen.run(prompts, share_keys=keys)
    ref_toks, ref_lens = _reference(engine, prompts, sp, max_new)
    _check(res, ref_toks, ref_lens, max_new)
    # one prefill per distinct repeated key at most (the singleton rides the
    # plain batched refill; equal-length keys may straggle across waves but
    # the saved window covers consecutive stragglers of the SAME key)
    assert n_prefills[0] <= len(base) + 1, n_prefills[0]


def test_continuous_share_keys_multimodal_int8(tiny_llava):
    """Repeated (prompt, image) items share one vision encode + prefill;
    int8 KV cache exercises the rank-generic broadcast scatter on the
    {k, k_scale, v, v_scale} leaves."""
    import dataclasses

    cfg, _, params = tiny_llava
    qcfg = dataclasses.replace(
        cfg, llm=dataclasses.replace(cfg.llm, kv_cache_dtype="int8")
    )
    model = LlavaForCausalLM(qcfg)
    engine = DecodeEngine(model, params, eos_id=-1, pad_id=0)
    P = cfg.num_image_tokens
    rng = np.random.default_rng(8)
    n_img = 2
    images_u = rng.normal(size=(
        n_img, cfg.vision.image_size, cfg.vision.image_size, 3
    )).astype(np.float32)

    prompts, starts, keys, img_rows = [], [], [], []
    for q in range(n_img):
        body = list(map(int, rng.integers(3, 200, size=4 + q)))
        for _ in range(3):
            prompts.append([1] + [-2] * P + list(body))
            starts.append(1)
            keys.append(q)
            img_rows.append(q)
    images = images_u[np.asarray(img_rows)]

    sp = SamplingParams.greedy()
    max_new = 5
    gen = ContinuousGenerator(
        engine, slots=2, chunk=4, max_new_tokens=max_new,
        sampling=sp, prompt_bucket=8,
    )
    res = gen.run(prompts, images=images, image_starts=starts,
                  share_keys=keys)
    ref_toks, ref_lens = _reference(
        engine, prompts, sp, max_new, images=images, image_starts=starts
    )
    _check(res, ref_toks, ref_lens, max_new)


def test_continuous_share_keys_sampled_rows_differ(tiny_lm):
    """Temperature sampling across shared-refill slots must still draw
    independent tokens per slot (identical logits, per-row categorical)."""
    _, model, params = tiny_lm
    engine = DecodeEngine(model, params, eos_id=-1, pad_id=0)
    rng = np.random.default_rng(9)
    p = list(map(int, rng.integers(3, 200, size=10)))
    prompts = [list(p) for _ in range(6)]
    keys = [0] * 6
    sp = SamplingParams(temperature=1.0, do_sample=True)
    gen = ContinuousGenerator(
        engine, slots=4, chunk=4, max_new_tokens=8,
        sampling=sp, prompt_bucket=8,
    )
    res = gen.run(prompts, share_keys=keys, seed=3)
    rows = {tuple(res.tokens[i]) for i in range(6)}
    assert len(rows) > 1, "all sampled continuations identical"


def test_continuous_share_keys_singleton_saves_window(tiny_lm):
    """A repeated key whose FIRST wave holds only one instance must still
    route through the shared path so its window is saved — the next wave's
    occurrences then refill with no prefill at all (ADVICE r3:
    continuous.py singleton fallthrough)."""
    _, model, params = tiny_lm
    engine = DecodeEngine(model, params, eos_id=-1, pad_id=0)
    rng = np.random.default_rng(5)
    pa = list(map(int, rng.integers(3, 200, size=9)))
    pb = list(map(int, rng.integers(3, 200, size=7)))
    # slots=3 -> wave 1 pops [A, A, B]: B is a singleton with two more
    # queued occurrences behind it
    prompts = [list(pa), list(pa), list(pb), list(pb), list(pb)]
    keys = ["A", "A", "B", "B", "B"]

    sp = SamplingParams.greedy()
    max_new = 5
    gen = ContinuousGenerator(
        engine, slots=3, chunk=4, max_new_tokens=max_new,
        sampling=sp, prompt_bucket=8,
    )
    n_prefills = [0]
    orig = gen._build_window_prefill

    def counting(Lp, mode):
        fn = orig(Lp, mode)

        def wrapped(*a, **kw):
            n_prefills[0] += 1
            return fn(*a, **kw)

        return wrapped

    gen._build_window_prefill = counting
    res = gen.run(prompts, share_keys=keys)
    ref_toks, ref_lens = _reference(engine, prompts, sp, max_new)
    _check(res, ref_toks, ref_lens, max_new)
    # exactly one window prefill per distinct key: B's singleton saved its
    # window in wave 1, so wave 2's two B rows scatter from it
    assert n_prefills[0] == 2, n_prefills[0]
