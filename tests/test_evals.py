"""Eval harnesses with stubbed GPT transports (no network)."""
import json
import os

import numpy as np
import pytest

from rlaifv_tpu.evals.gpt_client import FAIL_SENTINEL, Chat
from rlaifv_tpu.evals.mmhal import (
    NUM_QUESTIONS,
    judge as mmhal_judge,
    load_answer_template,
    parse_rating,
    summarize as mmhal_summarize,
)
from rlaifv_tpu.evals.object_halbench import (
    SynonymMapper,
    compute_chair,
    extract_objects_gpt,
    parse_object_list,
    refine_extracted_objects,
)
from rlaifv_tpu.evals.refomb import (
    build_query,
    judge_hallucination,
    judge_pairwise,
    load_dev_set,
    parse_verdict,
    summarize as refomb_summarize,
    summarize_hallucination,
)
from rlaifv_tpu.evals.text_utils import lemmatize, tokenize


def _stub_chat(reply_fn):
    def transport(model, messages, **kw):
        return reply_fn(messages), {"total_tokens": 10}

    return Chat(model="stub", transport=transport)


# ----------------------------------------------------------- text utils


def test_lemmatize_fallback():
    assert lemmatize("cats") == "cat"
    assert lemmatize("benches") == "bench"
    assert lemmatize("people") == "person"
    assert lemmatize("glass") == "glass"
    assert lemmatize("bus") == "bus"
    assert lemmatize("skis") == "ski"


def test_tokenize_fallback():
    assert tokenize("Two cats, one dog.") == [
        "Two", "cats", ",", "one", "dog", "."
    ]


# ----------------------------------------------------------- chair


def test_parse_object_list():
    assert parse_object_list('["cat", "dog"]') == ["cat", "dog"]
    assert parse_object_list('text\n["car"]') == ["car"]


def test_synonym_mapper_caption():
    m = SynonymMapper()
    kept, node_words, raw = m.caption_to_coco(
        "A baby dog next to two motor bikes and a wine glass."
    )
    classes = {n for _, n in node_words}
    assert "dog" in classes
    assert "motorcycle" in classes or "motor bike" in {w for w, _ in node_words}
    assert any("wine glass" in w for w, _ in node_words)


def test_compute_chair_counts():
    m = SynonymMapper()
    caps = [
        {"image_id": 1, "caption": "A dog and a cat."},
        {"image_id": 2, "caption": "A sandwich on a table."},
    ]
    gt = {1: {"dog"}, 2: {"sandwich", "dining table"}}
    out = compute_chair(caps, gt, m)
    om = out["overall_metrics"]
    assert om["sentence_num"] == 2
    # caption 1 hallucinates 'cat'
    assert out["sentences"][0]["metrics"]["CHAIRs"] == 1
    assert out["sentences"][1]["metrics"]["CHAIRs"] == 0
    assert 0 < om["CHAIRi"] < 1


def test_gpt_extraction_and_refine():
    chat = _stub_chat(lambda msgs: '["black dog", "red frisbees"]')
    caps = [{"image_id": 1, "caption": "c", "question": "q"}]
    out, used, _ = extract_objects_gpt(caps, chat, max_workers=2)
    assert out[0]["extract_objs"] == ["black dog", "red frisbees"]
    m = SynonymMapper()
    refined = refine_extracted_objects(out, m)
    assert "dog" in " ".join(refined[0]["objs"])


# ----------------------------------------------------------- mmhal


def test_mmhal_parse_and_summary():
    assert parse_rating("... Rating: 5, very informative") == 5
    assert parse_rating("no rating here") == 0
    responses = [
        {"choices": [{"message": {"content": f"Rating: {i % 7}"}}]}
        for i in range(NUM_QUESTIONS)
    ]
    s = mmhal_summarize(responses)
    assert 0 <= s["average_score"] <= 6
    assert 0 <= s["hallucination_rate"] <= 1
    assert len(s["scores_each_type"]) == 8


def test_mmhal_judge_template_flow():
    template_rows = load_answer_template()
    assert len(template_rows) == NUM_QUESTIONS
    rows = [dict(r, model_answer="A test answer.") for r in template_rows]
    chat = _stub_chat(lambda msgs: "Analysis...\nRating: 4, fine")
    responses = mmhal_judge(rows, chat=chat, max_workers=4)
    s = mmhal_summarize(responses)
    assert s["average_score"] == 4.0
    assert s["hallucination_rate"] == 0.0


def test_mmhal_wrong_cardinality():
    with pytest.raises(AssertionError):
        mmhal_judge([{"model_answer": "x"}] * 10, chat=_stub_chat(lambda m: ""))


# ----------------------------------------------------------- refomb


def test_refomb_parse_verdict():
    assert parse_verdict("blah [[A]] blah")[0] == -1
    assert parse_verdict("[[B]]")[0] == 1
    assert parse_verdict("[[C]]")[0] == 0
    with pytest.raises(ValueError):
        parse_verdict("no verdict")


def test_refomb_dev_set_loads():
    rows = load_dev_set()
    assert len(rows) > 0


def test_refomb_judge_and_summary():
    items = [
        {"question": f"q{i}", "description": "desc",
         "model_answer": "good", "baseline_answer": "bad",
         "type_name": "Description-Simple"}
        for i in range(6)
    ]
    # judge always answers [[A]]: with randomized sides, orientation must
    # flip so 'model wins' iff model was NOT side A... verdict A means side
    # A is better; score is oriented positive-for-model.
    chat = _stub_chat(lambda msgs: "[[A]]")
    rows = judge_pairwise(items, chat=chat, max_workers=2, seed=0)
    for r in rows:
        want = 1 if r["model_is_A"] else -1
        assert r["score"] == want
    s = refomb_summarize(rows)
    assert s["total"] == 6
    assert s["win_rate"] + s["tie_rate"] <= 1.0


def test_refomb_hallucination_rejudge():
    """Second pass re-judges the first pass's review text; orientation uses
    model_is_A; score = mean((s+1)/2) (ref eval_hallucination.py:168-173)."""
    items = [
        {"question": f"q{i}", "description": "desc",
         "model_answer": "good", "baseline_answer": "bad",
         "type_name": "Description-Simple"}
        for i in range(6)
    ]
    rows = judge_pairwise(
        items, chat=_stub_chat(lambda m: "[[A]]"), max_workers=2, seed=0
    )

    # hallucination judge sees the review text, not the answers
    seen = []

    def hall_reply(msgs):
        seen.append(msgs[-1]["content"])
        return "model A made stuff up. [[B]]"

    hall = judge_hallucination(rows, chat=_stub_chat(hall_reply), max_workers=2)
    assert all("[Beginning of the review text]" in p for p in seen)
    for r in hall:
        # verdict B = side B fewer hallucinations -> our model wins iff it
        # was side B
        want = -1 if r["model_is_A"] else 1
        assert r["hall_score"] == want
    s = summarize_hallucination(hall)
    assert s["total"] == 6
    n_b = sum(1 for r in hall if not r["model_is_A"])
    np.testing.assert_allclose(s["hallucination_score"], n_b / 6)
    assert "Description-Simple" in s["per_category"]


def test_refomb_hallucination_skips_failed_reviews():
    rows = [{"judge_output": FAIL_SENTINEL, "model_is_A": True},
            {"judge_output": "review", "model_is_A": False}]
    hall = judge_hallucination(rows, chat=_stub_chat(lambda m: "[[C]]"),
                               max_workers=1)
    assert hall[0]["hall_score"] is None
    assert hall[1]["hall_score"] == 0
    s = summarize_hallucination(hall)
    assert s["skipped"] == 1 and s["total"] == 1
    np.testing.assert_allclose(s["hallucination_score"], 0.5)


def test_gpt_client_fail_sentinel():
    def transport(model, messages, **kw):
        raise ConnectionError("down")

    chat = Chat(model="x", transport=transport, backoff_base=0.0)
    text, usage = chat.chat_completion([{"role": "user", "content": "hi"}],
                                       fail_limit=3)
    assert text == FAIL_SENTINEL
