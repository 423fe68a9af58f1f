"""Beam search: beam-1 == greedy; beam-3 score is >= greedy's score."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rlaifv_tpu.genai.engine import DecodeEngine
from rlaifv_tpu.genai.sampling import SamplingParams
from rlaifv_tpu.models.llama import LlamaConfig, LlamaForCausalLM


@pytest.fixture(scope="module")
def lm():
    cfg = LlamaConfig.tiny(attn_impl="dense")
    model = LlamaForCausalLM(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 8), jnp.int32))[
        "params"
    ]
    return cfg, model, params


def _seq_logprob(model, params, prompt, continuation):
    seq = jnp.asarray([list(prompt) + list(continuation)], jnp.int32)
    logits, _ = model.apply({"params": params}, seq)
    logp = jax.nn.log_softmax(logits[0].astype(jnp.float32), axis=-1)
    total = 0.0
    for t, tok in enumerate(continuation):
        total += float(logp[len(prompt) - 1 + t, tok])
    return total


def test_beam1_matches_greedy(lm):
    cfg, model, params = lm
    engine = DecodeEngine(model, params, eos_id=-1, pad_id=0)
    prompts = [[1, 7, 8, 9], [1, 5, 6]]
    greedy = engine.generate(prompts, sampling=SamplingParams.greedy(),
                             max_new_tokens=5, prompt_bucket=4)
    beam1 = engine.generate_beam(prompts, num_beams=1, max_new_tokens=5,
                                 prompt_bucket=4)
    np.testing.assert_array_equal(beam1.tokens, greedy.tokens)


@pytest.mark.slow
def test_beam3_not_worse_than_greedy(lm):
    cfg, model, params = lm
    engine = DecodeEngine(model, params, eos_id=-1, pad_id=0)
    prompt = [1, 7, 8, 9]
    greedy = engine.generate([prompt], sampling=SamplingParams.greedy(),
                             max_new_tokens=6, prompt_bucket=4)
    beam3 = engine.generate_beam([prompt], num_beams=3, max_new_tokens=6,
                                 prompt_bucket=4)

    lp_greedy = _seq_logprob(model, params, prompt, greedy.tokens[0])
    lp_beam = _seq_logprob(model, params, prompt, beam3.tokens[0])
    assert lp_beam >= lp_greedy - 1e-4, (lp_beam, lp_greedy)


def test_beam_eos_freezes(lm):
    cfg, model, params = lm
    # use the greedy first token as EOS: beam 0 should finish immediately
    engine0 = DecodeEngine(model, params, eos_id=-1, pad_id=0)
    probe = engine0.generate([[1, 7, 8, 9]], max_new_tokens=1, prompt_bucket=4)
    eos = int(probe.tokens[0, 0])

    engine = DecodeEngine(model, params, eos_id=eos, pad_id=0)
    res = engine.generate_beam([[1, 7, 8, 9]], num_beams=3, max_new_tokens=4,
                               prompt_bucket=4)
    # best hypothesis may be the finished one or a longer alternative, but
    # post-EOS positions of the returned row must be padded
    row = res.tokens[0]
    eos_pos = np.where(row == eos)[0]
    if len(eos_pos):
        assert (row[eos_pos[0] + 1:] == 0).all()


@pytest.mark.slow
def test_beam_with_int8_kv_cache(lm):
    """Beam search is cache-structure generic (tile/reorder via
    jax.tree.map), so the int8 KV cache flows through unchanged: beam1
    must equal greedy under the SAME cache dtype (identical quantized
    reads on both paths)."""
    import dataclasses

    cfg, _, params = lm
    qcfg = dataclasses.replace(cfg, kv_cache_dtype="int8")
    model = LlamaForCausalLM(qcfg)
    engine = DecodeEngine(model, params, eos_id=-1, pad_id=0)
    prompts = [[1, 7, 8, 9], [1, 5, 6]]
    greedy = engine.generate(prompts, sampling=SamplingParams.greedy(),
                             max_new_tokens=5, prompt_bucket=4)
    beam1 = engine.generate_beam(prompts, num_beams=1, max_new_tokens=5,
                                 prompt_bucket=4)
    np.testing.assert_array_equal(beam1.tokens, greedy.tokens)
    beam3 = engine.generate_beam(prompts, num_beams=3, max_new_tokens=5,
                                 prompt_bucket=4)
    assert beam3.tokens.shape == greedy.tokens.shape
    assert (beam3.lengths > 0).all()


@pytest.mark.slow
def test_beam_sample_reproducible_and_seed_varies(lm):
    """12B chat mode: beams combined with sampling (ref chat.py:98-112).
    Same seed -> identical sequences; different seeds -> different draws."""
    cfg, model, params = lm
    engine = DecodeEngine(model, params, eos_id=-1, pad_id=0)
    prompts = [[1, 7, 8, 9], [1, 5, 6]]
    sp = SamplingParams.chat_12b()
    a = engine.generate_beam(prompts, num_beams=3, max_new_tokens=6,
                             prompt_bucket=4, sampling=sp, seed=0)
    b = engine.generate_beam(prompts, num_beams=3, max_new_tokens=6,
                             prompt_bucket=4, sampling=sp, seed=0)
    np.testing.assert_array_equal(a.tokens, b.tokens)
    outs = {
        tuple(engine.generate_beam(
            prompts, num_beams=3, max_new_tokens=6, prompt_bucket=4,
            sampling=sp, seed=s,
        ).tokens[0].tolist())
        for s in range(4)
    }
    assert len(outs) > 1, "beam sampling never varied across seeds"


@pytest.mark.slow
def test_beam_sample_low_temperature_matches_greedy(lm):
    """As T -> 0 each beam's warped distribution collapses onto its argmax,
    so a single sampled beam must follow the greedy chain. (With K>1 the
    deterministic and sampled rankings legitimately differ: beam search
    ranks by true logp, beam-sample by warped score — HF does the same.)"""
    cfg, model, params = lm
    engine = DecodeEngine(model, params, eos_id=-1, pad_id=0)
    prompts = [[1, 7, 8, 9]]
    greedy = engine.generate(prompts, sampling=SamplingParams.greedy(),
                             max_new_tokens=5, prompt_bucket=4)
    sp = SamplingParams(temperature=1e-4, do_sample=True)
    samp = engine.generate_beam(prompts, num_beams=1, max_new_tokens=5,
                                prompt_bucket=4, sampling=sp, seed=0)
    np.testing.assert_array_equal(greedy.tokens, samp.tokens)
