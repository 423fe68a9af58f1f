"""The complete RLAIF-V iteration with REAL (tiny) models end-to-end:

  diverse gen (tiny LLaVA, T=0.7) -> divide/changeq (deterministic fact
  backends) -> autocheck yes/no scoring (tiny LLaVA) -> pair construction
  -> length balance -> ref-logp parquet (tiny LLaVA as frozen reference)
  -> DPODataset -> one real DPO train step.

The stub-based orchestrator test pins the filename/field contracts; this
one proves the actual engines produce data the next stage consumes, all
the way into an optimizer update.
"""
import base64
import io
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from run_data_pipeline import run_pipeline  # noqa: E402

from rlaifv_tpu.genai.llava_gen import Llava15Generator  # noqa: E402
from rlaifv_tpu.models.llava import LlavaConfig, LlavaForCausalLM  # noqa: E402
from rlaifv_tpu.utils.file_io import read_jsonlines, write_jsonlines  # noqa: E402
from tests.fake_tokenizer import FakeTokenizer  # noqa: E402


def _fact_backend(n_facts=3):
    """Deterministic divide/changeq stand-in (the reference's Llama3 role):
    emits prompt-dependent bullet facts so pair scores vary per answer.
    crc32, not hash() — Python's hash is salted per process."""
    import zlib

    def gen(prompts):
        out = []
        for p in prompts:
            h = zlib.crc32(p.encode())
            facts = [f"- object {i} kind {(h >> (4 * i)) % 7} is visible."
                     for i in range(1 + h % n_facts)]
            out.append("\n".join(facts))
        return out

    def tmpl(messages):
        return "T:" + messages[0]["content"]

    return gen, tmpl


def test_full_rlaifv_loop_with_real_models(tmp_path):
    cfg = LlavaConfig.tiny()
    model = LlavaForCausalLM(cfg)
    tok = FakeTokenizer()
    P = cfg.num_image_tokens
    S = cfg.vision.image_size
    rng = np.random.default_rng(0)
    params = model.init(
        jax.random.PRNGKey(0), jnp.ones((1, P + 8), jnp.int32),
        images=jnp.zeros((1, S, S, 3)), image_starts=jnp.asarray([0]),
    )["params"]
    gen = Llava15Generator(model, params, tok, P, image_size=S,
                           checkpoint_name="tiny-policy")

    # --- question file: b64 image for generation + on-disk path for the
    # autocheck stage (reference flow: labeler reloads via image_path)
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    ques_rows = []
    for i in range(2):
        arr = rng.integers(0, 255, size=(S, S, 3), dtype=np.uint8)
        path = str(img_dir / f"{i}.png")
        Image.fromarray(arr).save(path)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        ques_rows.append({
            "question": f"Describe object {i} now",
            "image": base64.b64encode(buf.getvalue()).decode(),
            "ds_question_id": f"ds{i}",
            "metainfos": {"image_path": path, "ds_question_id": f"ds{i}"},
        })
    ques = tmp_path / "q.jsonl"
    write_jsonlines(str(ques), ques_rows)

    pairs_path = run_pipeline(
        gen, gen, _fact_backend(), _fact_backend(),
        str(ques), str(tmp_path / "results"),
        sample_num=2, repeat=4, batch_size=4, max_tokens=6,
    )
    pairs = read_jsonlines(pairs_path)
    assert pairs, "the loop produced no preference pairs"
    for p in pairs:
        assert p["chosen"] != p["rejected"]
        assert os.path.exists(p["image_path"])

    # --- ref-logp precompute on the frozen policy -> training parquet
    from rlaifv_tpu.data.image_processing import ClipImageProcessor
    from rlaifv_tpu.train.ref_logp import inference_logp

    train_rows = []
    for i, p in enumerate(pairs):
        with open(p["image_path"], "rb") as f:
            img_bytes = f.read()
        train_rows.append({
            "idx": str(i),
            "question": p["question"],
            "chosen": p["chosen"],
            "rejected": p["rejected"],
            "image": {"bytes": img_bytes, "path": p["image_path"]},
            "image_path": p["image_path"],
            "origin_dataset": "loop-test",
            "origin_split": "{}",
        })
    cache_dir = str(tmp_path / "logp_cache")
    os.makedirs(cache_dir)
    proc = ClipImageProcessor(image_size=S)
    inference_logp(train_rows, model, params, tok, cache_dir,
                   max_len=160, num_patches=P, batch_pairs=2,
                   image_processor=proc)

    # --- one real DPO step from the cache
    from rlaifv_tpu.data.collator import DPOCollator
    from rlaifv_tpu.data.datasets import DPODataset
    from rlaifv_tpu.train.train_step import (
        DPOHparams,
        LlavaDPOAdapter,
        dpo_loss_from_batch,
    )

    mm_cfg = {
        "is_multimodal": True,
        "image_processor": proc,
        "image_token_len": P,
        "use_im_start_end": False,
    }
    ds = DPODataset(tok, cache_dir, mm_cfg)
    assert len(ds) == len(pairs)
    coll = DPOCollator(pad_token_id=0, max_len=160, num_patches=P)
    n = min(2, len(ds))
    batch = coll([ds[i] for i in range(n)])
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    loss, metrics = dpo_loss_from_batch(
        LlavaDPOAdapter(model), params, jb, DPOHparams()
    )
    # policy == frozen reference => the DPO loss is exactly log 2
    np.testing.assert_allclose(float(loss), float(np.log(2.0)), atol=2e-3)
