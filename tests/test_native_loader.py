"""Native C++ JPEG loader: parity with PIL path + threading + fallbacks."""
import io
import time

import numpy as np
import pytest

from rlaifv_tpu.data.native_loader import (
    NativeImageLoader,
    jpeg_dims,
    native_available,
)


def _jpeg_bytes(rng, w, h, quality=95):
    from PIL import Image

    arr = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def test_native_builds():
    assert native_available(), "C++ loader failed to build"


def test_jpeg_dims():
    rng = np.random.default_rng(0)
    blob = _jpeg_bytes(rng, 123, 77)
    assert jpeg_dims(blob) == (123, 77)
    assert jpeg_dims(b"not a jpeg") is None


def test_decode_pad_matches_pil():
    from PIL import Image

    rng = np.random.default_rng(1)
    blob = _jpeg_bytes(rng, 200, 120)
    loader = NativeImageLoader()
    native = loader([blob])[0]
    assert native.shape == (200, 200, 3)

    pil = np.asarray(Image.open(io.BytesIO(blob)).convert("RGB"))
    fallback = loader._fallback([blob])[0]
    # same pad geometry and identical decoded pixels (both use libjpeg)
    np.testing.assert_array_equal(native, fallback)
    top = (200 - 120) // 2
    np.testing.assert_array_equal(native[top : top + 120, :200], pil)
    # background fill
    assert (native[0, 0] == loader.background).all()


def test_batch_mixed_sizes_threaded():
    rng = np.random.default_rng(2)
    blobs = [_jpeg_bytes(rng, int(w), int(h))
             for w, h in rng.integers(40, 400, size=(16, 2))]
    loader = NativeImageLoader(num_threads=8)
    outs = loader(blobs)
    assert len(outs) == 16
    for o in outs:
        assert o.shape[0] == o.shape[1] and o.dtype == np.uint8


def test_non_jpeg_falls_back():
    from PIL import Image

    rng = np.random.default_rng(3)
    arr = rng.integers(0, 255, size=(50, 60, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    loader = NativeImageLoader()
    out = loader([buf.getvalue()])[0]  # PNG -> PIL fallback
    assert out.shape == (60, 60, 3)
