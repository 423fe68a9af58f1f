"""scripts/run_eval.py orchestration with stub GPT transports."""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from run_eval import eval_mmhal, eval_objhal  # noqa: E402

from rlaifv_tpu.utils.file_io import write_jsonlines  # noqa: E402


def _coco_dir(tmp_path):
    d = str(tmp_path / "coco")
    os.makedirs(d, exist_ok=True)
    json.dump({
        "categories": [{"id": 1, "name": "dog"}],
        "annotations": [{"image_id": i, "category_id": 1} for i in range(300)],
    }, open(os.path.join(d, "instances_val2014.json"), "w"))
    json.dump({
        "annotations": [{"image_id": i, "caption": "A dog."} for i in range(300)],
    }, open(os.path.join(d, "captions_val2014.json"), "w"))
    return d


def test_eval_objhal_no_gpt(tmp_path, capsys):
    answers = str(tmp_path / "answers.jsonl")
    write_jsonlines(answers, [
        {"question_id": i, "image_id": i, "prompt": "Describe.",
         "text": "A dog." if i % 2 else "A cat."}
        for i in range(300)
    ])
    out = eval_objhal(answers, _coco_dir(tmp_path), str(tmp_path / "out"),
                      use_gpt=False)
    assert os.path.exists(out)
    data = json.load(open(out))
    om = data["overall_metrics"]
    assert om["sentence_num"] == 300
    assert 0.4 < om["CHAIRs"] < 0.6  # half the captions hallucinate 'cat'
    printed = capsys.readouterr().out
    assert "response_hall" in printed


def test_eval_mmhal_stub(tmp_path, monkeypatch, capsys):
    import rlaifv_tpu.evals.gpt_client as gc

    def stub_transport(model, messages, **kw):
        return "Analysis.\nRating: 5, great", {}

    monkeypatch.setattr(
        gc, "openai_http_transport", lambda **kw: stub_transport
    )
    answers = str(tmp_path / "mmhal_answers.json")
    from rlaifv_tpu.evals.mmhal import NUM_QUESTIONS

    json.dump(
        [{"question_id": i, "text": f"answer {i}"} for i in range(NUM_QUESTIONS)],
        open(answers, "w"),
    )
    summary = eval_mmhal(answers, str(tmp_path / "out"))
    assert summary["average_score"] == 5.0
    assert summary["hallucination_rate"] == 0.0
    assert os.path.exists(str(tmp_path / "out" / "mmhal_review.json"))
