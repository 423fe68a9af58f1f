"""Queue-mode generation: order restoration + parity with per-prompt greedy."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow
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
    return model, params


def test_generate_many_matches_individual(lm):
    model, params = lm
    engine = DecodeEngine(model, params, eos_id=-1, pad_id=0)
    prompts = [
        [1, 7, 8, 9, 10, 11],
        [1, 5],
        [1, 20, 21, 22],
        [1, 3, 4, 5, 6, 7, 8],
        [1, 9],
    ]
    many = engine.generate_many(
        prompts, batch_size=2, sampling=SamplingParams.greedy(),
        max_new_tokens=4, prompt_bucket=4,
    )
    for i, p in enumerate(prompts):
        solo = engine.generate(
            [p], sampling=SamplingParams.greedy(), max_new_tokens=4,
            prompt_bucket=4,
        )
        np.testing.assert_array_equal(
            many.tokens[i][:4], solo.tokens[0],
            err_msg=f"row {i} mismatch after reordering",
        )
