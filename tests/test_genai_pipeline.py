"""Divide-and-conquer + LLaVA gen/autocheck engines with stub backends."""
import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rlaifv_tpu.genai.divide_conquer import (
    batch_process,
    changeq_messages,
    construct_question_yesno,
    divide_messages,
    parse_facts,
)
from rlaifv_tpu.genai.llava_gen import (
    Llava15Generator,
    run,
    wrap_question_for_llava15,
)
from rlaifv_tpu.data.datasets import GenDataset
from rlaifv_tpu.models.llava import LlavaConfig, LlavaForCausalLM
from rlaifv_tpu.utils.file_io import read_jsonlines, write_jsonlines
from tests.fake_tokenizer import FakeTokenizer


def test_parse_facts():
    text = "### Facts:\n- The sky is blue.\n- A cat sits.\n\n### End"
    assert parse_facts(text) == ["The sky is blue.", "A cat sits."]


def test_divide_messages_truncates_to_300_words():
    item = {"question": "q " * 400, "answer": "a"}
    msgs = divide_messages(item)
    assert len(msgs[0]["content"].split(" ")) <= 300


def test_changeq_messages_lists_facts():
    msgs = changeq_messages({"facts": ["A.", "B."]})
    assert "- A.\n" in msgs[0]["content"] and "- B.\n" in msgs[0]["content"]


def test_batch_process_resumable(tmp_path):
    src = tmp_path / "in.jsonl"
    rows = [{"question": f"q{i}", "answer": f"a{i}", "question_id": i}
            for i in range(5)]
    write_jsonlines(str(src), rows)
    ans = str(tmp_path / "out.jsonl")

    calls = []

    def gen(prompts):
        calls.extend(prompts)
        return ["- fact one.\n- fact two."] * len(prompts)

    tmpl = lambda msgs: "PROMPT:" + msgs[0]["content"][:20]

    out = batch_process(str(src), ans, gen, tmpl, key="facts",
                        wrap_func=divide_messages, batch_size=2)
    assert len(out) == 5
    assert all(o["facts"] == ["fact one.", "fact two."] for o in out)

    # truncate the answer file to 3 rows, rerun -> only 2 more generated
    lines = open(ans).readlines()
    with open(ans, "w") as f:
        f.writelines(lines[:3])
    calls.clear()
    out = batch_process(str(src), ans, gen, tmpl, key="facts",
                        wrap_func=divide_messages, batch_size=2)
    assert len(out) == 5 and len(calls) == 2


def test_construct_question_yesno(tmp_path):
    src = tmp_path / "gq.jsonl"
    write_jsonlines(str(src), [{
        "question_id": 7,
        "ds_question_id": "ds7",
        "question": "What?",
        "answer": "Something.",
        "facts": ["A cat.", "A dog."],
        "changed_facts": ["Is there a cat?", "Is there a dog?"],
        "metainfos": {"image_path": "/img/7.jpg"},
    }])
    out = construct_question_yesno(str(src), str(tmp_path / "qas.jsonl"))
    assert len(out) == 2
    assert out[0]["question"] == "Is there a cat? Please answer yes or no."
    assert out[0]["metainfos"]["origin_fact"] == "A cat."
    assert out[1]["ds_question_id"] == "ds7"


@pytest.fixture(scope="module")
def tiny_gen():
    cfg = LlavaConfig.tiny()
    model = LlavaForCausalLM(cfg)
    tok = FakeTokenizer()
    P = cfg.num_image_tokens
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.ones((1, P + 8), jnp.int32),
        images=jnp.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3)),
        image_starts=jnp.asarray([0]),
    )["params"]
    gen = Llava15Generator(model, params, tok, P,
                           image_size=cfg.vision.image_size,
                           checkpoint_name="tiny-test")
    return cfg, gen, tok


def _items(cfg, n):
    rng = np.random.default_rng(0)
    items = []
    for i in range(n):
        arr = rng.integers(0, 255, size=(cfg.vision.image_size,
                                         cfg.vision.image_size, 3),
                           dtype=np.uint8)
        items.append({
            "question": f"Is object {i} present?",
            "question_id": i,
            "image": arr,
            "metainfos": {"ds_question_id": f"ds{i}"},
        })
    return items


def test_wrap_question(tiny_gen):
    cfg, gen, tok = tiny_gen
    ids = wrap_question_for_llava15("What is this?", tok)
    from rlaifv_tpu.constants import IMAGE_TOKEN_INDEX

    assert ids.count(IMAGE_TOKEN_INDEX) == 1
    assert ids[0] == tok.bos_token_id


import pytest


@pytest.mark.slow
@pytest.mark.parametrize("continuous", [False, True])
def test_diverse_gen_rows(tiny_gen, continuous):
    cfg, gen, tok = tiny_gen
    rows = gen.diverse_gen(_items(cfg, 3), max_new_tokens=4, batch_size=2,
                           continuous=continuous)
    assert len(rows) == 3
    for r in rows:
        assert set(r) >= {"question_id", "ds_question_id", "raw_question",
                          "answer", "metainfos", "model_path"}
        assert r["model_path"] == "tiny-test"


@pytest.mark.slow
def test_greedy_gen_beam_mode(tiny_gen):
    """num_beams>1 routes through the KV-cached beam search (reference eval
    scripts decode with beam 3)."""
    cfg, gen, tok = tiny_gen
    rows = gen.greedy_gen(_items(cfg, 2), max_new_tokens=4, batch_size=2,
                          num_beams=3)
    assert len(rows) == 2 and all("answer" in r for r in rows)


def test_autocheck_scores(tiny_gen):
    cfg, gen, tok = tiny_gen
    rows = gen.autocheck(_items(cfg, 2), batch_size=2)
    for r in rows:
        s = r["scores"]
        assert set(s) == {"yes", "Yes", "no", "No"}
        assert all(0.0 <= v <= 1.0 for v in s.values())


@pytest.mark.slow
def test_generate_repeated_matches_generate(tiny_gen):
    """ONE prefill + tiled KV + B=n decode must reproduce generate() on n
    copies of the prompt (greedy: exact token match)."""
    from rlaifv_tpu.genai.sampling import SamplingParams

    cfg, gen, tok = tiny_gen
    item = _items(cfg, 1)[0]
    prompts, starts, images = gen._prepare([item])
    n = 3
    plain = gen.engine.generate(
        prompts * n, images=np.stack([images[0]] * n),
        image_starts=np.asarray([starts[0]] * n),
        sampling=SamplingParams.greedy(), max_new_tokens=6,
    )
    rep = gen.engine.generate_repeated(
        prompts[0], n=n, image=images[0], image_start=int(starts[0]),
        sampling=SamplingParams.greedy(), max_new_tokens=6,
    )
    assert np.array_equal(plain.tokens, rep.tokens)
    assert np.array_equal(plain.lengths, rep.lengths)
    np.testing.assert_allclose(plain.first_logits, rep.first_logits,
                               atol=1e-4)


@pytest.mark.slow
def test_diverse_gen_share_repeats(tiny_gen):
    """repeat_time-style items (identical question+image runs) go through
    the shared-prefill path; output order and row schema are preserved."""
    cfg, gen, tok = tiny_gen
    base = _items(cfg, 2)
    items = [dict(base[0], question_id=f"0.{k}") for k in range(3)]
    items += [dict(base[1], question_id="1.0")]  # singleton tail
    rows = gen.diverse_gen(items, max_new_tokens=4, batch_size=2,
                           share_repeats=True)
    assert [r["question_id"] for r in rows] == ["0.0", "0.1", "0.2", "1.0"]
    for r in rows:
        assert isinstance(r["answer"], str)
        assert r["model_path"] == "tiny-test"


@pytest.mark.slow
def test_autocheck_shared_prefix_parity(tiny_gen):
    """The shared-prefix fast path (one prefill per image, suffix-only
    per fact) must reproduce the plain full-prefill scores: causal
    attention makes the shared-prefix KV identical across rows."""
    cfg, gen, tok = tiny_gen
    items = _items(cfg, 5)
    img = items[0]["image"]
    for it in items:  # one image, many fact questions -> one shared group
        it["image"] = img
    # mixed-length suffixes exercise the right-pad/last-index gather
    items[2]["question"] = "Is there a very small red object near the top?"
    plain = gen.autocheck(items, batch_size=2, shared_prefix=False)
    shared = gen.autocheck(items, batch_size=2, shared_prefix=True)
    for a, b in zip(plain, shared):
        assert a["answer"] == b["answer"]
        for w in a["scores"]:
            assert abs(a["scores"][w] - b["scores"][w]) < 1e-4, (
                w, a["scores"], b["scores"])


def test_autocheck_shared_prefix_mixed_groups(tiny_gen):
    """Groups of 1 fall back to the plain path; output order follows the
    input, not the grouping."""
    cfg, gen, tok = tiny_gen
    items = _items(cfg, 4)
    items[1]["image"] = items[0]["image"]  # group {0,1}, singletons {2},{3}
    rows = gen.autocheck(items, batch_size=2, shared_prefix=True)
    assert [r["question_id"] for r in rows] == [0, 1, 2, 3]
    plain = gen.autocheck(items, batch_size=2, shared_prefix=False)
    for a, b in zip(plain, rows):
        for w in a["scores"]:
            assert abs(a["scores"][w] - b["scores"][w]) < 1e-4


def test_autocheck_shuffled_input_regroups(tiny_gen, caplog):
    """Shuffled/interleaved input must NOT silently forfeit the shared
    path (VERDICT r2 next #5): group_consecutive regroups by key over the
    whole list and logs the regroup; scores match the plain path and
    output order follows the input."""
    import logging

    from rlaifv_tpu.genai.engine import group_consecutive

    cfg, gen, tok = tiny_gen
    items = _items(cfg, 6)
    # interleave two images: a, b, a, b, a, b (never consecutive)
    for k in range(6):
        items[k]["image"] = items[k % 2]["image"]

    with caplog.at_level(logging.INFO, logger="rlaifv_tpu.genai.engine"):
        groups = group_consecutive(items)
    assert sorted(len(g) for g in groups) == [3, 3]
    assert any("regrouped" in r.message for r in caplog.records)

    shared = gen.autocheck(items, batch_size=2, shared_prefix=True)
    assert [r["question_id"] for r in shared] == list(range(6))
    plain = gen.autocheck(items, batch_size=2, shared_prefix=False)
    for a, b in zip(plain, shared):
        for w in a["scores"]:
            assert abs(a["scores"][w] - b["scores"][w]) < 1e-4


@pytest.mark.slow
def test_run_sharded_files(tiny_gen, tmp_path):
    cfg, gen, tok = tiny_gen
    qa = tmp_path / "qa.jsonl"
    items = _items(cfg, 4)
    for it in items:
        it["image"] = None  # GenDataset doesn't carry arrays through json
    write_jsonlines(str(qa), [{k: v for k, v in it.items() if k != "image"}
                              for it in items])

    class _DS(GenDataset):
        def __getitem__(self, i):
            item = super().__getitem__(i)
            rng = np.random.default_rng(i)
            item["image"] = rng.integers(
                0, 255, size=(cfg.vision.image_size, cfg.vision.image_size, 3),
                dtype=np.uint8)
            return item

    ds = _DS(str(qa), repeat_time=2)
    ans = str(tmp_path / "answers.jsonl")
    run(gen, ds, ans, is_yesno=True, batch_size=4, rank=0, world_size=2)
    run(gen, ds, ans, is_yesno=True, batch_size=4, rank=1, world_size=2)
    r0 = read_jsonlines(ans + ".rank0")
    r1 = read_jsonlines(ans + ".rank1")
    assert len(r0) + len(r1) == len(ds)
