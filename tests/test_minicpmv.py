"""MiniCPM-V: slicing geometry, multi-span splice, tiny model forward."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rlaifv_tpu.data.minicpmv_slicing import (
    best_grid,
    ensure_divide,
    find_best_resize,
    get_grid_placeholder,
    get_image_placeholder,
    reshape_by_patch,
    slice_image,
    slice_image_plan,
)
from rlaifv_tpu.models.minicpmv import (
    MiniCPMVConfig,
    MiniCPMVForCausalLM,
    find_unk_spans,
    splice_multi_span,
)


def test_ensure_divide():
    assert ensure_divide(100, 14) == 98
    assert ensure_divide(5, 14) == 14


def test_find_best_resize_budget():
    w, h = find_best_resize((1920, 1080), 448, 14)
    assert w * h <= 448 * 448 * 1.2
    assert w % 14 == 0 and h % 14 == 0
    # small image without upscale keeps size (patch-aligned)
    w, h = find_best_resize((300, 200), 448, 14)
    assert (w, h) == (ensure_divide(300, 14), ensure_divide(200, 14))


def test_best_grid_matches_aspect():
    g = best_grid((2000, 500), 4, 9)  # wide image -> more cols than rows
    assert g[0] > g[1]
    g = best_grid((500, 2000), 4, 9)
    assert g[1] > g[0]
    assert best_grid((448, 448), 1, 9) is None


def test_slice_plan_and_pil():
    from PIL import Image

    img = Image.new("RGB", (1920, 1080), (120, 40, 200))
    plan = slice_image_plan(img.size)
    assert plan["grid"] is not None
    cols, rows = plan["grid"]
    assert len(plan["cells"]) == cols * rows

    source, patches, grid = slice_image(img)
    assert grid == plan["grid"]
    assert len(patches) == cols * rows
    for p in patches:
        assert p.size[0] % 14 == 0 and p.size[1] % 14 == 0

    small = Image.new("RGB", (300, 200))
    source, patches, grid = slice_image(small)
    assert grid is None and patches == []


def test_placeholders():
    assert get_grid_placeholder(None, 4) == ""
    text = get_image_placeholder((2, 1), 3)
    assert text.startswith("<image><unk><unk><unk></image>\n")
    assert text.count("<slice>") == 2


def test_reshape_by_patch():
    img = np.arange(3 * 28 * 42).reshape(3, 28, 42).astype(np.float32)
    out = reshape_by_patch(img, 14)
    assert out.shape == (3, 14, 28 * 42 // 14)
    # first patch column preserved
    np.testing.assert_array_equal(out[:, :, :14], img[:, :14, :14])


def test_find_unk_spans():
    ids = [5, 9, 9, 9, 7, 9, 9, 9, 2, 9]
    assert find_unk_spans(ids, 9, 3) == [1, 5]
    assert find_unk_spans(ids, 9, 2) == []  # runs of 3 and 1, not 2


def test_splice_multi_span():
    rng = np.random.default_rng(0)
    B, L, S, Q, D = 2, 12, 3, 2, 4
    text = rng.normal(size=(B, L, D)).astype(np.float32)
    feats = rng.normal(size=(B, S, Q, D)).astype(np.float32)
    starts = np.array([[0, 4, 8], [2, -1, -1]], dtype=np.int32)

    got = np.asarray(splice_multi_span(
        jnp.asarray(text), jnp.asarray(feats), jnp.asarray(starts)))
    want = text.copy()
    for b in range(B):
        for s in range(S):
            st = starts[b, s]
            if st >= 0:
                want[b, st : st + Q] = feats[b, s]
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.slow
def test_minicpmv_tiny_forward():
    cfg = MiniCPMVConfig.tiny()
    model = MiniCPMVForCausalLM(cfg)
    rng = np.random.default_rng(0)
    B, L, S, Q = 2, 24, 2, cfg.query_num
    size = cfg.vision.image_size

    ids = jnp.asarray(rng.integers(4, cfg.llm.vocab_size, size=(B, L)))
    slices = jnp.asarray(
        rng.normal(size=(B * S, size, size, 3)).astype(np.float32))
    starts = jnp.asarray([[1, 8], [3, -1]], dtype=jnp.int32)

    lm_params = model.init(
        jax.random.PRNGKey(0), ids,
        span_features=jnp.zeros((B, S, Q, cfg.llm.hidden_size)),
        span_starts=starts,
    )["params"]
    vision_params = model.init(
        jax.random.PRNGKey(1), slices, method=model.encode_slices
    )["params"]
    params = {**lm_params, **vision_params}
    feats = model.apply(
        {"params": params}, slices, method=model.encode_slices
    )
    feats = feats.reshape(B, S, Q, cfg.llm.hidden_size)
    logits, _ = model.apply(
        {"params": params}, ids, span_features=feats, span_starts=starts
    )
    assert logits.shape == (B, L, cfg.llm.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.slow
def test_minicpmv_int8_serving_engine():
    """Int8 LM + int8 KV single-chip serving config drives the span-splice
    engine end-to-end at tiny geometry (the 2.5 labeler path)."""
    import dataclasses

    from rlaifv_tpu.genai.engine import DecodeEngine
    from rlaifv_tpu.genai.sampling import SamplingParams
    from rlaifv_tpu.models.convert import quantize_llm_int8
    from rlaifv_tpu.models.minicpmv import MiniCPMVConfig, MiniCPMVForCausalLM

    base = MiniCPMVConfig.tiny()
    cfg = dataclasses.replace(
        base,
        llm=dataclasses.replace(base.llm, quantize=True,
                                quantize_lm_head=False,
                                kv_cache_dtype="int8"),
    )
    fmodel = MiniCPMVForCausalLM(base)
    B, S, Q = 2, 2, base.query_num
    ids = np.full((B, 2 * Q + 6), 3, np.int32)
    starts = np.asarray([[1, 1 + Q], [1, -1]], np.int32)
    lm_params = fmodel.init(
        jax.random.PRNGKey(0), jnp.asarray(ids),
        span_features=jnp.zeros((B, S, Q, base.llm.hidden_size)),
        span_starts=jnp.asarray(starts),
    )["params"]
    qparams = {**lm_params, "llm": quantize_llm_int8(
        lm_params["llm"], include_lm_head=False)}

    model = MiniCPMVForCausalLM(cfg)
    engine = DecodeEngine(model, jax.tree.map(jnp.asarray, qparams),
                          eos_id=-1, pad_id=0)
    spans = np.random.default_rng(0).normal(
        size=(B, S, Q, base.llm.hidden_size)).astype(np.float32)
    res = engine.generate(
        [list(map(int, r)) for r in ids],
        span_features=spans, span_starts=starts,
        sampling=SamplingParams.greedy(), max_new_tokens=3, prompt_bucket=8,
    )
    assert res.tokens.shape == (B, 3)
    assert np.isfinite(np.asarray(res.first_logits, np.float32)).all()


@pytest.mark.slow
@pytest.mark.parametrize("bits", [8, 4])
def test_minicpmv_fused_decode_engine(bits):
    """The 2.5 labeler decodes through the multi-layer fused kernel
    (Llama3-family GQA stack): greedy tokens match the per-layer path
    for both the int8 and int4 bases, with the span-splice prefill."""
    import dataclasses

    from rlaifv_tpu.genai.engine import DecodeEngine
    from rlaifv_tpu.genai.sampling import SamplingParams
    from rlaifv_tpu.models.convert import (
        fuse_llm_projections,
        quantize_llm_int4,
        quantize_llm_int8,
    )
    from rlaifv_tpu.models.minicpmv import MiniCPMVConfig, MiniCPMVForCausalLM

    base = MiniCPMVConfig.tiny()
    cfg = dataclasses.replace(
        base,
        llm=dataclasses.replace(base.llm, quantize=True, quantize_bits=bits,
                                quantize_lm_head=False,
                                kv_cache_dtype="int8", fuse_proj=True),
    )
    fmodel = MiniCPMVForCausalLM(base)
    B, S, Q = 2, 2, base.query_num
    ids = np.full((B, 2 * Q + 6), 3, np.int32)
    starts = np.asarray([[1, 1 + Q], [1, -1]], np.int32)
    lm_params = fmodel.init(
        jax.random.PRNGKey(0), jnp.asarray(ids),
        span_features=jnp.zeros((B, S, Q, base.llm.hidden_size)),
        span_starts=jnp.asarray(starts),
    )["params"]
    quant = (quantize_llm_int8 if bits == 8
             else lambda p: quantize_llm_int4(p))
    qparams = jax.tree.map(jnp.asarray, {
        **lm_params,
        "llm": fuse_llm_projections(quant(lm_params["llm"])),
    })

    model = MiniCPMVForCausalLM(cfg)
    spans = np.random.default_rng(0).normal(
        size=(B, S, Q, base.llm.hidden_size)).astype(np.float32)
    kw = dict(span_features=spans, span_starts=starts,
              sampling=SamplingParams.greedy(), max_new_tokens=3,
              prompt_bucket=8)
    prompts = [list(map(int, r)) for r in ids]

    want = DecodeEngine(model, qparams, eos_id=-1, pad_id=0).generate(
        prompts, **kw
    )
    fused = DecodeEngine(model, jax.tree.map(jnp.copy, qparams),
                         eos_id=-1, pad_id=0, fused_decode=True)
    got = fused.generate(prompts, **kw)
    np.testing.assert_array_equal(got.tokens, want.tokens)
    np.testing.assert_array_equal(got.lengths, want.lengths)
