"""Full feedback-loop orchestration with stub engines: filename contracts +
data flowing end-to-end into training-ready balanced pairs."""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from run_data_pipeline import run_pipeline  # noqa: E402

from rlaifv_tpu.utils.file_io import read_jsonlines, write_jsonlines  # noqa: E402


class StubGenerator:
    """Mimics Llava15Generator: diverse answers + yes/no autocheck."""

    def __init__(self, seed=0):
        self.rng = np.random.default_rng(seed)

    def diverse_gen(self, items, **kw):
        rows = []
        for item in items:
            n_words = 5 + int(self.rng.integers(0, 10))
            rows.append({
                "question_id": item["question_id"],
                "ds_question_id": item.get(
                    "ds_question_id", f"ds{item['question_id'] // 10}"
                ),
                "raw_question": item["question"],
                "answer": " ".join(
                    f"w{int(self.rng.integers(0, 30))}" for _ in range(n_words)
                ),
                "metainfos": {
                    "image_path": f"/img/{item.get('image_id', 0)}.jpg",
                    "ds_question_id": item.get(
                        "ds_question_id", f"ds{item['question_id'] // 10}"
                    ),
                },
                "model_path": "stub-policy",
            })
        return rows

    def autocheck(self, items, **kw):
        rows = []
        for item in items:
            yes = float(self.rng.uniform(0, 1))
            rows.append({
                "question_id": item["question_id"],
                "ds_question_id": item["ds_question_id"],
                "raw_question": item["question"],
                "answer": "yes" if yes > 0.5 else "no",
                "scores": {"yes": yes, "Yes": yes / 3,
                           "no": 1 - yes, "No": (1 - yes) / 3},
                "metainfos": item["metainfos"],
                "model_path": "stub-labeler",
            })
        return rows


def _stub_llm_backend():
    def gen(prompts):
        return ["- There is a cat.\n- The cat is black."] * len(prompts)

    def tmpl(messages):
        return "T:" + messages[0]["content"][:40]

    return gen, tmpl


def test_full_pipeline_contract(tmp_path):
    ques = tmp_path / "q.jsonl"
    write_jsonlines(str(ques), [
        {"question": f"Describe image {i}.", "image_id": i} for i in range(3)
    ])
    ans_dir = str(tmp_path / "results")

    out = run_pipeline(
        StubGenerator(), StubGenerator(seed=1),
        _stub_llm_backend(), _stub_llm_backend(),
        str(ques), ans_dir,
        sample_num=2,
    )
    # reference filename contract end-to-end
    assert out.endswith("_pair_diff1_samp2_balanceshort.jsonl")
    assert os.path.basename(out).startswith("autocheck_omni_0--1_diverse_gen_llava15_0--1_q")

    files = sorted(os.listdir(ans_dir))
    assert any(f == "diverse_gen_llava15_0--1_q.jsonl" for f in files)
    assert any(".llama3-8b_divide.jsonl" in f for f in files)
    assert any(".llama3-8b_divide.gq.jsonl" in f for f in files)
    assert any(".llama3-8b_divide.gq.qas.jsonl" in f for f in files)

    pairs = read_jsonlines(out)
    for p in pairs:
        assert {"question", "chosen", "rejected", "ds_question_id",
                "image_path"} <= set(p)
        assert p["chosen"] != p["rejected"]

    # idempotent resume: stage outputs are reused, pipeline still succeeds
    out2 = run_pipeline(
        StubGenerator(), StubGenerator(seed=1),
        _stub_llm_backend(), _stub_llm_backend(),
        str(ques), ans_dir, sample_num=2,
    )
    assert out2 == out
