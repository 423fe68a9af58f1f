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


def test_uint8_device_normalize_matches_host():
    """The resize-only uint8 upload path: encode_images' on-device
    normalization must be bit-equal to the host ClipImageProcessor float
    output (same fp32 elementwise math)."""
    import jax
    import jax.numpy as jnp

    from rlaifv_tpu.data.image_processing import ClipImageProcessor
    from rlaifv_tpu.models.llava import LlavaConfig, LlavaForCausalLM
    from PIL import Image

    cfg = LlavaConfig.tiny()
    model = LlavaForCausalLM(cfg)
    S = cfg.vision.image_size
    rng = np.random.default_rng(0)
    raw = Image.fromarray(
        rng.integers(0, 255, size=(50, 70, 3), dtype=np.uint8)
    )
    proc = ClipImageProcessor(
        image_size=S,
        mean=cfg.vision.image_mean, std=cfg.vision.image_std,
    )
    host = proc(raw)[None]  # (1, S, S, 3) float32, normalized
    dev_in = proc.resize_uint8(raw)[None]  # (1, S, S, 3) uint8
    assert dev_in.dtype == np.uint8

    params = model.init(
        jax.random.PRNGKey(0), jnp.ones((1, cfg.num_image_tokens + 4),
                                        jnp.int32),
        images=jnp.asarray(host), image_starts=jnp.asarray([0]),
    )["params"]
    f_host = model.apply({"params": params}, jnp.asarray(host),
                         method=model.encode_images)
    f_dev = model.apply({"params": params}, jnp.asarray(dev_in),
                        method=model.encode_images)
    np.testing.assert_array_equal(np.asarray(f_host), np.asarray(f_dev))
