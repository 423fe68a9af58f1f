"""Full-pipeline integration: ref-logp precompute -> parquet cache ->
RLAIFVDataset -> DPODataset -> collator -> train step.

Key invariant: immediately after precompute, policy == reference, so every
DPO loss must equal -log sigmoid(0) = log(2) and every reward must be 0.
This gates end-to-end logp consistency across tokenization, expansion,
collation and the model forward (BASELINE 'logprob parity' metric).
"""
import io
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rlaifv_tpu.data.collator import DPOCollator
from rlaifv_tpu.data.datasets import (
    DPODataset,
    GenDataset,
    RLAIFVDataset,
    chunk_indices,
    shard_indices,
)
from rlaifv_tpu.data.image_processing import ClipImageProcessor
from rlaifv_tpu.models.llava import LlavaConfig, LlavaForCausalLM
from rlaifv_tpu.train.ref_logp import inference_logp
from rlaifv_tpu.train.train_step import (
    DPOHparams,
    DPOTrainState,
    LlavaDPOAdapter,
    dpo_loss_from_batch,
)
from tests.fake_tokenizer import FakeTokenizer


def _png_bytes(rng, size):
    from PIL import Image

    arr = rng.integers(0, 255, size=(size, size, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def _rows(rng, n, img_size):
    rows = []
    for i in range(n):
        rows.append({
            "idx": str(i),
            "question": f"What is in image {i}?",
            "chosen": f"A small {i} cat.",
            "rejected": f"A big {i} dog and a hat.",
            "image": {"bytes": _png_bytes(rng, img_size), "path": f"img{i}.png"},
            "image_path": f"img{i}.png",
            "origin_dataset": "unit",
            "origin_split": "{}",
        })
    return rows


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    cfg = LlavaConfig.tiny()
    model = LlavaForCausalLM(cfg)
    tok = FakeTokenizer()
    rng = np.random.default_rng(0)
    P = cfg.num_image_tokens
    img_size = cfg.vision.image_size

    ids0 = jnp.ones((2, P + 8), jnp.int32)
    params = model.init(
        jax.random.PRNGKey(0), ids0,
        images=jnp.zeros((2, img_size, img_size, 3)),
        image_starts=jnp.asarray([0, 0]),
    )["params"]

    rows = _rows(rng, 5, img_size)
    out_dir = str(tmp_path_factory.mktemp("logp_cache"))
    proc = ClipImageProcessor(image_size=img_size)
    inference_logp(
        rows, model, params, tok, out_dir,
        max_len=192, num_patches=P, batch_pairs=2, image_processor=proc,
    )
    return cfg, model, params, tok, out_dir, proc


def test_parquet_cache_written(pipeline):
    *_, out_dir, proc = pipeline
    files = [f for f in os.listdir(out_dir) if f.endswith(".parquet")]
    assert files and all("logp" in f for f in files)


def test_dataset_roundtrip(pipeline):
    cfg, model, params, tok, out_dir, proc = pipeline
    ds = RLAIFVDataset(out_dir)
    assert len(ds) == 5
    row = ds[0]
    assert isinstance(row["ref_win_logp"], float)
    assert isinstance(row["ref_win_per_token_logp"], list)
    assert row["question"]["value"].startswith("<image>\n")


def test_policy_equals_reference_gives_log2_loss(pipeline):
    cfg, model, params, tok, out_dir, proc = pipeline
    P = cfg.num_image_tokens
    mm_cfg = {
        "is_multimodal": True,
        "image_processor": proc,
        "image_token_len": P,
        "use_im_start_end": False,
    }
    ds = DPODataset(tok, out_dir, mm_cfg)
    coll = DPOCollator(pad_token_id=tok.pad_token_id, max_len=192,
                       num_patches=P, beta=0.1)
    batch = coll([ds[i] for i in range(4)])
    jb = {k: jnp.asarray(v) for k, v in batch.items()}

    adapter = LlavaDPOAdapter(model)
    loss, metrics = dpo_loss_from_batch(
        adapter, params, jb, DPOHparams(beta=0.1)
    )
    # policy == reference => margin 0 => loss = log 2, rewards = 0
    np.testing.assert_allclose(float(loss), np.log(2.0), atol=1e-4)
    np.testing.assert_allclose(
        float(metrics["rewards_train/chosen"]), 0.0, atol=1e-3
    )
    np.testing.assert_allclose(
        float(metrics["rewards_train/rejected"]), 0.0, atol=1e-3
    )


@pytest.mark.slow
def test_score_rows_fused_head_matches_xla(pipeline):
    """Ref-logp precompute with lm_head_impl='fused' reproduces the XLA
    path (the train step offers the same switch; matching impls keeps the
    log-2 cancellation exact)."""
    cfg, model, params, tok, out_dir, proc = pipeline
    from rlaifv_tpu.train.ref_logp import score_preference_rows

    rng = np.random.default_rng(7)
    rows = _rows(rng, 3, cfg.vision.image_size)
    kw = dict(max_len=192, num_patches=cfg.num_image_tokens, batch_pairs=2,
              image_processor=proc, progress=False)
    ref = score_preference_rows(rows, model, params, tok, **kw)
    fused = score_preference_rows(rows, model, params, tok,
                                  lm_head_impl="fused", **kw)
    for a, b in zip(ref, fused):
        np.testing.assert_allclose(a[0], b[0], rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(a[3], b[3], rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(a[2], b[2], rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_shared_prefix_ref_logp_parity(pipeline, monkeypatch):
    """Shared-prefix scoring (one prefix prefill per pair + suffix-only
    forwards) reproduces the plain two-full-forwards path: sums, means and
    the full per-token layout (VERDICT r2 next #3).

    The test must PROVE the shared engine path actually ran: at max_len=192
    the P=16 sentinel expansion used to truncate every answer's labels, so
    all 5 rows silently fell back to the plain scorer and this test compared
    the plain path against itself (the round-3 vacuous-parity bug that hid a
    real phase-1 mask-width crash in engine.score_pair_logps). max_len=320
    keeps the answers, and the spy asserts the fast path scored real rows."""
    cfg, model, params, tok, out_dir, proc = pipeline
    from rlaifv_tpu.genai.engine import DecodeEngine
    from rlaifv_tpu.train.ref_logp import score_preference_rows

    shared_rows = []
    orig = DecodeEngine.score_pair_logps

    def spy(self, prefixes, *a, **kw):
        shared_rows.append(len(prefixes))
        return orig(self, prefixes, *a, **kw)

    monkeypatch.setattr(DecodeEngine, "score_pair_logps", spy)

    rng = np.random.default_rng(11)
    rows = _rows(rng, 5, cfg.vision.image_size)
    kw = dict(max_len=320, num_patches=cfg.num_image_tokens, batch_pairs=2,
              image_processor=proc, progress=False)
    plain = score_preference_rows(rows, model, params, tok, **kw)
    shared = score_preference_rows(rows, model, params, tok,
                                   shared_prefix=True, **kw)
    assert sum(shared_rows) == 5, (
        f"shared engine path scored {sum(shared_rows)}/5 rows — the rest "
        "fell back to the plain scorer, making this parity test vacuous"
    )
    for a, b in zip(plain, shared):
        np.testing.assert_allclose(a[0], b[0], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(a[1], b[1], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(a[3], b[3], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(a[4], b[4], rtol=1e-4, atol=1e-4)
        assert len(a[2]) == len(b[2]) and len(a[5]) == len(b[5])
        np.testing.assert_allclose(a[2], b[2], rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(a[5], b[5], rtol=1e-3, atol=1e-4)


def test_shard_and_chunk_math():
    # contiguous shards cover everything exactly once
    allidx = []
    for r in range(3):
        allidx.extend(shard_indices(10, 3, r))
    assert allidx == list(range(10))
    # strided chunks cover everything exactly once
    got = sorted(sum((chunk_indices(11, 4, c) for c in range(4)), []))
    assert got == list(range(11))


def test_gen_dataset(tmp_path):
    import json

    qa = tmp_path / "qa.jsonl"
    with open(qa, "w") as f:
        for i in range(3):
            f.write(json.dumps({"question": f"q{i}", "image_id": i}) + "\n")
    ds = GenDataset(str(qa), repeat_time=4)
    assert len(ds) == 12
    assert ds[0]["question"] == "q0" and ds[0]["sample_idx"] == 0
    assert ds[5]["question"] == "q1" and ds[5]["sample_idx"] == 1

    ds0 = GenDataset(str(qa), repeat_time=4, chunk_num=3, chunk_idx=0)
    ds1 = GenDataset(str(qa), repeat_time=4, chunk_num=3, chunk_idx=1)
    ds2 = GenDataset(str(qa), repeat_time=4, chunk_num=3, chunk_idx=2)
    assert len(ds0) + len(ds1) + len(ds2) == 12
