"""Iterative alignment driver (scripts/run_iteration.py): the reference's
x4 protocol — per iteration, data pipeline with the current policy, DPO
training, per-checkpoint eval scoring, best-checkpoint promotion (ref
README.md:205-221) — run for 2 iterations with real tiny models, then
resumed (finished iterations are skipped and their promotions restored)."""
import base64
import io
import os
import sys
import zlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from run_iteration import run_iterative_alignment  # noqa: E402

from rlaifv_tpu.core.config import Config  # noqa: E402
from rlaifv_tpu.data.image_processing import ClipImageProcessor  # noqa: E402
from rlaifv_tpu.genai.llava_gen import Llava15Generator  # noqa: E402
from rlaifv_tpu.models.llava import LlavaConfig, LlavaForCausalLM  # noqa: E402
from rlaifv_tpu.utils.file_io import write_jsonlines  # noqa: E402
from tests.fake_tokenizer import FakeTokenizer  # noqa: E402


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

    return gen, lambda messages: "T:" + messages[0]["content"]


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("iterloop")
    cfg = LlavaConfig.tiny()
    model = LlavaForCausalLM(cfg)
    tok = FakeTokenizer()
    P, S = cfg.num_image_tokens, cfg.vision.image_size
    rng = np.random.default_rng(0)
    params = model.init(
        jax.random.PRNGKey(0), jnp.ones((1, P + 8), jnp.int32),
        images=jnp.zeros((1, S, S, 3)), image_starts=jnp.asarray([0]),
    )["params"]

    from PIL import Image

    img_dir = tmp / "imgs"
    img_dir.mkdir()
    ques_rows, eval_rows = [], []
    for i in range(2):
        arr = rng.integers(0, 255, size=(S, S, 3), dtype=np.uint8)
        path = str(img_dir / f"{i}.png")
        Image.fromarray(arr).save(path)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        b64 = base64.b64encode(buf.getvalue()).decode()
        ques_rows.append({
            "question": f"Describe object {i} now",
            "image": b64,
            "ds_question_id": f"ds{i}",
            "metainfos": {"image_path": path, "ds_question_id": f"ds{i}"},
        })
        eval_rows.append({
            "question_id": i, "question": f"What is in image {i}?",
            "image": b64,
        })
    ques = tmp / "q.jsonl"
    write_jsonlines(str(ques), ques_rows)
    return tmp, cfg, model, tok, params, str(ques), eval_rows


def _train_config(out_root):
    c = Config()
    t = c.training
    t.output_dir = str(out_root)  # rewritten per iteration by the driver
    t.max_steps = 4
    t.save_steps = 2  # -> checkpoints at steps 2 and 4 per iteration
    t.learning_rate = 1e-3
    t.per_device_batch_pairs = 2
    t.mesh_dp = 1
    t.mesh_fsdp = 1
    t.mesh_tp = 1
    return c


def test_two_iterations_then_resume(setup, capsys):
    tmp, cfg, model, tok, params, ques, eval_rows = setup
    P, S = cfg.num_image_tokens, cfg.vision.image_size
    proc = ClipImageProcessor(image_size=S)
    work = str(tmp / "work")

    def make_generator(p):
        return Llava15Generator(model, p, tok, P, image_size=S,
                                checkpoint_name="policy")

    # deterministic CHAIRs-style scorer: lower is better
    def score_answers(answers):
        return float(sum(len(a["text"]) for a in answers))

    final, history = run_iterative_alignment(
        _train_config(tmp / "cfg"), model, params, tok, proc,
        make_generator, _fact_backend(), _fact_backend(),
        ques, eval_rows, score_answers, work,
        iterations=2, max_len=160, num_patches=P,
        sample_num=2, repeat=3, batch_size=4, max_tokens=4,
        eval_max_new_tokens=4,
    )

    assert len(history) == 2
    for it, summary in enumerate(history, start=1):
        assert summary["iteration"] == it
        assert summary["n_pairs"] > 0
        # every saved checkpoint was scored, best is the argmin
        assert set(summary["scores"]) == {"2", "4"}
        best = summary["best_step"]
        assert summary["scores"][str(best)] == min(summary["scores"].values())
        assert os.path.exists(os.path.join(work, f"iter{it}", "summary.json"))

    # training actually moved the policy between iterations
    leaf0 = jax.tree_util.tree_leaves(params)[0]
    leaf2 = jax.tree_util.tree_leaves(final)[0]
    assert not np.allclose(np.asarray(leaf0), np.asarray(leaf2))

    # --- resume: both iterations are skipped, promotions restored from disk
    final2, history2 = run_iterative_alignment(
        _train_config(tmp / "cfg"), model, params, tok, proc,
        make_generator, _fact_backend(), _fact_backend(),
        ques, eval_rows, score_answers, work,
        iterations=2, max_len=160, num_patches=P,
        sample_num=2, repeat=3, batch_size=4, max_tokens=4,
        eval_max_new_tokens=4,
    )
    out = capsys.readouterr().out
    assert out.count("already done") == 2
    assert [h["best_step"] for h in history2] == [
        h["best_step"] for h in history
    ]
    for a, b in zip(jax.tree_util.tree_leaves(final),
                    jax.tree_util.tree_leaves(final2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
