"""30-item end-to-end data-gen smoke over examples/detail_test_30_input.jsonl
(mirrors the reference's examples/detail_test_30_input.jsonl shakeout,
ref script/data_gen/run_data_pipline_llava15_omni.sh:6-7): the full
gen -> divide -> autocheck -> pairs -> balance chain with tiny real models,
asserting every intermediate jsonl filename contract appears.
"""
import os
import sys
import zlib

import numpy as np
import pytest
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from run_data_pipeline import run_pipeline  # noqa: E402

from rlaifv_tpu.genai.llava_gen import Llava15Generator  # noqa: E402
from rlaifv_tpu.models.llava import LlavaConfig, LlavaForCausalLM  # noqa: E402
from rlaifv_tpu.utils.file_io import read_jsonlines  # noqa: E402
from tests.fake_tokenizer import FakeTokenizer  # noqa: E402

QUES = os.path.join(os.path.dirname(__file__), "..", "examples",
                    "detail_test_30_input.jsonl")


def _fact_backend(n_facts=3):
    def gen(prompts):
        out = []
        for p in prompts:
            h = zlib.crc32(p.encode())
            out.append("\n".join(
                f"- object {i} kind {(h >> (4 * i)) % 7} is visible."
                for i in range(1 + h % n_facts)
            ))
        return out

    def tmpl(messages):
        return "T:" + messages[0]["content"]

    return gen, tmpl


@pytest.mark.slow
def test_30_item_pipeline_smoke(tmp_path, monkeypatch):
    monkeypatch.chdir(os.path.join(os.path.dirname(__file__), ".."))
    rows = read_jsonlines(QUES)
    assert len(rows) == 30  # ref cardinality
    assert all(os.path.exists(r["image_path"]) for r in rows)

    cfg = LlavaConfig.tiny()
    model = LlavaForCausalLM(cfg)
    tok = FakeTokenizer()
    P = cfg.num_image_tokens
    S = cfg.vision.image_size
    params = model.init(
        jax.random.PRNGKey(0), jnp.ones((1, P + 8), jnp.int32),
        images=jnp.zeros((1, S, S, 3)), image_starts=jnp.asarray([0]),
    )["params"]
    gen = Llava15Generator(model, params, tok, P, image_size=S,
                           checkpoint_name="tiny-policy")

    out_dir = str(tmp_path / "results")
    pairs_path = run_pipeline(
        gen, gen, _fact_backend(), _fact_backend(),
        QUES, out_dir,
        sample_num=2, repeat=2, batch_size=16, max_tokens=4,
    )

    # every intermediate filename contract must exist
    base = "detail_test_30_input"
    ans = f"diverse_gen_llava15_0--1_{base}.jsonl"
    divide = ans.replace(".jsonl", ".s0-e-1.chunk1-0.llama3-8b_divide.jsonl")
    gq = divide.replace(".jsonl", ".gq.jsonl")
    qas = gq.replace(".jsonl", ".qas.jsonl")
    autocheck = f"autocheck_omni_0--1_{qas}"
    pair = autocheck.replace(".jsonl", "_pair_diff1_samp2.jsonl")
    balance = pair.replace(".jsonl", "_balanceshort.jsonl")
    for name in (ans, divide, gq, qas, autocheck, pair, balance):
        assert os.path.exists(os.path.join(out_dir, name)), name

    assert pairs_path == os.path.join(out_dir, balance)
    # 30 questions x repeat 2 answered
    assert len(read_jsonlines(os.path.join(out_dir, ans))) == 60
    pairs = read_jsonlines(pairs_path)
    assert pairs, "30-item loop produced no preference pairs"
    for p in pairs:
        assert p["chosen"] != p["rejected"]
