"""Tensor-parallel serving on the virtual device mesh (SURVEY P5).

The reference's model-placement story is HF accelerate `device_map="auto"`
(ref llava/model/builder.py:26, chat.py:31-37) — layer-granularity offload,
no tensor parallelism. Here the SAME DecodeEngine runs unchanged over a
(dp=1, fsdp=1, tp=N) mesh: params are placed with the production
PARAM_RULES (attention heads and ffn columns split over 'tp'), and GSPMD
inserts the all-reduces a hand-rolled Megatron layout would code by hand.
Greedy outputs must match the single-device engine exactly.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rlaifv_tpu.genai.engine import DecodeEngine
from rlaifv_tpu.genai.sampling import SamplingParams
from rlaifv_tpu.models.llama import LlamaConfig, LlamaForCausalLM
from rlaifv_tpu.parallel.sharding import create_mesh, shard_params

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs the virtual multi-device mesh"
)


def _prompts(cfg, n=3):
    rng = np.random.default_rng(11)
    return [
        list(map(int, rng.integers(5, cfg.vocab_size - 1, size=k)))
        for k in (5, 8, 3)[:n]
    ]


def test_tp_serving_matches_single_device():
    cfg = LlamaConfig.tiny()  # 4 heads / GQA kv=2: tp=2 divides both
    model = LlamaForCausalLM(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))[
        "params"]
    prompts = _prompts(cfg)
    kw = dict(sampling=SamplingParams.greedy(), max_new_tokens=6,
              prompt_bucket=8)

    want = DecodeEngine(model, params, eos_id=-1, pad_id=0).generate(
        prompts, **kw
    )

    mesh = create_mesh(dp=1, fsdp=1, tp=2, devices=jax.devices()[:2])
    sharded = shard_params(params, mesh)
    engine = DecodeEngine(model, sharded, eos_id=-1, pad_id=0)
    with mesh:
        got = engine.generate(prompts, **kw)

    np.testing.assert_array_equal(got.tokens, want.tokens)
    np.testing.assert_array_equal(got.lengths, want.lengths)
    np.testing.assert_allclose(
        np.asarray(got.first_logits, np.float32),
        np.asarray(want.first_logits, np.float32),
        rtol=2e-5, atol=2e-5,
    )


@pytest.mark.slow
def test_tp_serving_int4_matches_single_device():
    """tp=2 over a packed-int4 base: the nibble-packed int8 kernels shard
    by the same (fsdp, tp) rules as bf16/int8 (packing halves the K axis,
    which is orthogonal to the tp column split), the 2-D group scales
    replicate."""
    from rlaifv_tpu.models.convert import quantize_llm_int4

    cfg = LlamaConfig.tiny(quantize=True, quantize_bits=4,
                           quantize_lm_head=False)
    fparams = LlamaForCausalLM(LlamaConfig.tiny()).init(
        jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32)
    )["params"]
    params = jax.tree.map(jnp.asarray, quantize_llm_int4(fparams))
    model = LlamaForCausalLM(cfg)
    prompts = _prompts(cfg)
    kw = dict(sampling=SamplingParams.greedy(), max_new_tokens=6,
              prompt_bucket=8)

    want = DecodeEngine(model, params, eos_id=-1, pad_id=0).generate(
        prompts, **kw
    )

    mesh = create_mesh(dp=1, fsdp=1, tp=2, devices=jax.devices()[:2])
    sharded = shard_params(params, mesh)
    assert sharded["model"]["layer_0"]["attn"]["q_proj"]["kernel"].dtype \
        == jnp.int8  # nibble-packed (K/2, N)
    engine = DecodeEngine(model, sharded, eos_id=-1, pad_id=0)
    with mesh:
        got = engine.generate(prompts, **kw)

    np.testing.assert_array_equal(got.tokens, want.tokens)
    np.testing.assert_array_equal(got.lengths, want.lengths)


@pytest.mark.slow
def test_tp_continuous_serving_matches_single_device():
    """Slot-refill continuous batching composes with the tp mesh."""
    cfg = LlamaConfig.tiny()
    model = LlamaForCausalLM(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))[
        "params"]
    prompts = _prompts(cfg)
    kw = dict(sampling=SamplingParams.greedy(), max_new_tokens=5,
              slots=2, prompt_bucket=8)

    want = DecodeEngine(model, params, eos_id=-1, pad_id=0)\
        .generate_continuous(prompts, **kw)

    mesh = create_mesh(dp=1, fsdp=1, tp=2, devices=jax.devices()[:2])
    sharded = shard_params(params, mesh)
    engine = DecodeEngine(model, sharded, eos_id=-1, pad_id=0)
    with mesh:
        got = engine.generate_continuous(prompts, **kw)

    np.testing.assert_array_equal(got.tokens, want.tokens)
    np.testing.assert_array_equal(got.lengths, want.lengths)


@pytest.mark.slow
def test_tp_beam_serving_matches_single_device():
    """Beam-3 chat decode (the 7B chat config) under the tp mesh."""
    cfg = LlamaConfig.tiny()
    model = LlamaForCausalLM(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))[
        "params"]
    prompts = _prompts(cfg, n=2)
    kw = dict(num_beams=3, max_new_tokens=5, prompt_bucket=8)

    want = DecodeEngine(model, params, eos_id=-1, pad_id=0)\
        .generate_beam(prompts, **kw)

    mesh = create_mesh(dp=1, fsdp=1, tp=2, devices=jax.devices()[:2])
    sharded = shard_params(params, mesh)
    engine = DecodeEngine(model, sharded, eos_id=-1, pad_id=0)
    with mesh:
        got = engine.generate_beam(prompts, **kw)

    np.testing.assert_array_equal(got.tokens, want.tokens)
    np.testing.assert_array_equal(got.lengths, want.lengths)


@pytest.mark.slow
def test_tp_multimodal_serving_matches_single_device():
    """LLaVA engine (vision tower + projector + splice) under the tp mesh:
    the PARAM_RULES cover the CLIP fc1/fc2/attention kernels too."""
    from rlaifv_tpu.models.llava import LlavaConfig, LlavaForCausalLM

    cfg = LlavaConfig.tiny()
    model = LlavaForCausalLM(cfg)
    ids = jnp.ones((1, cfg.num_image_tokens + 8), jnp.int32)
    img = jnp.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3))
    params = model.init(jax.random.PRNGKey(0), ids, images=img,
                        image_starts=jnp.asarray([0]))["params"]

    rng = np.random.default_rng(5)
    T = cfg.num_image_tokens
    prompts, starts = [], []
    for k in (6, 4):
        p = list(map(int, rng.integers(5, cfg.llm.vocab_size - 1, size=k)))
        prompts.append(p[:1] + [0] * T + p[1:])
        starts.append(1)
    images = rng.standard_normal(
        (2, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    kw = dict(images=images, image_starts=starts,
              sampling=SamplingParams.greedy(), max_new_tokens=4,
              prompt_bucket=8)

    want = DecodeEngine(model, params, eos_id=-1, pad_id=0).generate(
        prompts, **kw
    )

    mesh = create_mesh(dp=1, fsdp=1, tp=2, devices=jax.devices()[:2])
    sharded = shard_params(params, mesh)
    engine = DecodeEngine(model, sharded, eos_id=-1, pad_id=0)
    with mesh:
        got = engine.generate(prompts, **kw)

    np.testing.assert_array_equal(got.tokens, want.tokens)
    np.testing.assert_array_equal(got.lengths, want.lengths)
