"""Pair construction parity vs reference utils/pair_construction.py +
assembly/filter behavior."""
import numpy as np
import pytest

from rlaifv_tpu.pairs.construction import build_pairs, fact_label
from rlaifv_tpu.pairs.length_filter import (
    filter_by_relative_length,
    search_balanced_cut,
)
from rlaifv_tpu.pairs.preference import assemble_pairs, sample_pairs
from tests.util_ref import REF_ROOT, load_ref_module, ref_available


def _fact_rows(rng, n_questions=4, n_answers=5, n_facts=3):
    rows = []
    for q in range(n_questions):
        for a in range(n_answers):
            qid = q * n_answers + a
            for f in range(n_facts):
                yes = float(rng.uniform(0, 1))
                rows.append({
                    "question_id": qid,
                    "raw_question": f"fact-{q}-{f}?",
                    "scores": {"yes": yes, "Yes": yes / 2,
                               "no": 1 - yes, "No": (1 - yes) / 3},
                    "metainfos": {
                        "ds_question_id": f"ds{q}",
                        "metainfos": {"origin_question": f"orig-q{q}"},
                    },
                })
    return rows


def test_fact_label():
    assert fact_label({"yes": 0.6, "Yes": 0.1, "no": 0.3, "No": 0.1}) == 1
    assert fact_label({"yes": 0.1, "Yes": 0.1, "no": 0.5, "No": 0.4}) == 0


@pytest.mark.skipif(not ref_available(), reason="reference absent")
def test_build_pairs_matches_reference():
    import sys

    sys.path.insert(0, REF_ROOT + "/utils")
    ref = load_ref_module("utils/pair_construction.py", "ref_pair_construction")

    rng = np.random.default_rng(0)
    rows = _fact_rows(rng)
    ours = build_pairs(rows, diff=1)
    theirs = ref.get_pairs_inner([dict(r) for r in rows], diff=1)

    key = lambda p: (p["ds_question_id"], p["chosen"]["question_id"],
                     p["rejected"]["question_id"])
    assert sorted(map(key, ours)) == sorted(map(key, theirs))
    for o, t in zip(sorted(ours, key=key), sorted(theirs, key=key)):
        assert o["chosen"]["score"] == t["chosen"]["score"]
        assert o["rejected"]["score"] == t["rejected"]["score"]


def _answer_rows(n_questions=4, n_answers=5, n_facts=3):
    rows = []
    for q in range(n_questions):
        for a in range(n_answers):
            qid = q * n_answers + a
            rows.append({
                "question_id": qid,
                "ds_question_id": f"ds{q}",
                "raw_question": f"orig-q{q}",
                "question": f"orig-q{q}",
                "answer": " ".join(["word"] * (5 + a * 3)),
                "facts": [f"fact-{q}-{f}?" for f in range(n_facts)],
                "metainfos": {"image_path": f"/imgs/{q}.jpg"},
            })
    return rows


def test_assemble_and_sample():
    rng = np.random.default_rng(1)
    facts = _fact_rows(rng)
    # group key must be 'dsq@origin-question' and answers join by id
    answers = _answer_rows()
    pairs, judges, annotated, kept = assemble_pairs(facts, answers, diff=1)
    assert pairs, "no pairs assembled"
    for p in pairs:
        assert p["question"].startswith("orig-q")
        assert p["chosen"] != "" and p["rejected"] != ""
        # scores serialize as strings (reference format)
        assert int(p["org_infos"]["scores"]["chosen"]["score"]) >= \
            int(p["org_infos"]["scores"]["rejected"]["score"])

    sampled = sample_pairs(pairs, 2, seed=0)
    from collections import Counter

    counts = Counter(p["ds_question_id"] for p in sampled)
    assert all(c <= 2 for c in counts.values())


def test_length_filter():
    pairs = [
        {"chosen": "a b c", "rejected": "a b c d e f g h"},  # rej much longer
        {"chosen": "a b c d", "rejected": "a b c e"},
        {"chosen": "same text", "rejected": "same text"},  # identical
    ]
    out = filter_by_relative_length(pairs, 0.3)
    assert len(out) == 1

    rng = np.random.default_rng(0)
    many = [
        {"chosen": " ".join(["w"] * int(rng.integers(5, 30))),
         "rejected": " ".join(["w"] * int(rng.integers(5, 30)))}
        for _ in range(100)
    ]
    final, ratio, best, sweep = search_balanced_cut(many)
    assert 0 <= ratio < 1
    assert best["total_diff_portion"] == min(s["total_diff_portion"] for s in sweep)
