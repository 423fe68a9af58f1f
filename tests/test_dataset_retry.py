"""Dataset resilience: a corrupt row is skipped (retry-next-row), matching
the reference's err_count<=3 behavior (muffin/data/datasets.py:196-205)."""
import io


import numpy as np
import pytest

from rlaifv_tpu.data.datasets import DPODataset, write_logp_parquet
from rlaifv_tpu.data.image_processing import ClipImageProcessor
from tests.fake_tokenizer import FakeTokenizer


def _png_bytes(rng, size):
    from PIL import Image

    arr = rng.integers(0, 255, size=(size, size, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def _rows(n, size, corrupt=()):
    rng = np.random.default_rng(0)
    rows = []
    for i in range(n):
        img = b"not a real image" if i in corrupt else _png_bytes(rng, size)
        rows.append({
            "idx": str(i),
            "question": f"What is in image {i}?",
            "chosen": f"A dog number {i}.",
            "rejected": f"A cat number {i}.",
            "image": {"bytes": img, "path": f"img{i}.png"},
            "image_path": f"img{i}.png",
            "origin_dataset": "retry-test",
            "origin_split": "{}",
        })
    return rows


def _dataset(tmp_path, corrupt=()):
    size = 28
    rows = _rows(4, size, corrupt=corrupt)
    fake_logps = [[-1.0, -0.5, [-0.1] * 8, -2.0, -1.0, [-0.2] * 8]] * len(rows)
    write_logp_parquet(rows, str(tmp_path), fake_logps)
    mm_cfg = {
        "is_multimodal": True,
        "image_processor": ClipImageProcessor(image_size=size),
        "image_token_len": 4,
        "use_im_start_end": False,
    }
    return DPODataset(FakeTokenizer(), str(tmp_path), mm_cfg)


def test_corrupt_row_is_skipped(tmp_path):
    ds = _dataset(tmp_path, corrupt={1})
    rej, win = ds[1]  # falls through to row 2
    # the substitute row is a real, fully-encoded sample
    assert win["input_ids"].ndim == 1 and win["labels"].ndim == 1
    # healthy rows are untouched
    rej0, win0 = ds[0]
    assert win0["input_ids"].ndim == 1


def test_all_rows_corrupt_raises(tmp_path):
    ds = _dataset(tmp_path, corrupt={0, 1, 2, 3})
    with pytest.raises(RuntimeError, match="consecutive corrupt rows"):
        ds[0]
