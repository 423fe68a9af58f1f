"""Device image pipeline parity vs the PIL host path."""
import numpy as np
import pytest

from rlaifv_tpu.data.image_processing import ClipImageProcessor
from rlaifv_tpu.ops.image_kernels import DeviceImagePipeline, pil_resize_weights


def test_weights_rows_sum_to_one():
    for src, dst in ((448, 336), (336, 336), (100, 336), (1344, 336)):
        W = pil_resize_weights(src, dst)
        np.testing.assert_allclose(W.sum(axis=1), 1.0, atol=1e-5)
        assert W.shape == (dst, src)


@pytest.mark.parametrize("shape", [(448, 448), (640, 480), (100, 260), (336, 336)])
def test_device_pipeline_matches_pil(shape):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(*shape, 3), dtype=np.uint8)

    host = ClipImageProcessor(image_size=336)
    want = host(img)

    dev = DeviceImagePipeline(image_size=336)
    got = dev([img])[0]

    # PIL uses fixed-point int16 coefficients; allow 2 uint8 LSBs
    std = np.asarray(host.std, np.float32)
    diff_pixels = np.abs(got - want) * std * 255.0
    assert diff_pixels.max() <= 2.0, f"max pixel diff {diff_pixels.max()}"


def test_device_pipeline_batches_mixed_sizes():
    rng = np.random.default_rng(1)
    imgs = [
        rng.integers(0, 255, size=(s, s, 3), dtype=np.uint8)
        for s in (336, 448, 448, 512)
    ]
    dev = DeviceImagePipeline(image_size=336)
    out = dev(imgs)
    assert out.shape == (4, 336, 336, 3)
    assert np.isfinite(out).all()
