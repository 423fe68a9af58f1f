"""anyres merge math vs a direct torch-style oracle of llava_arch.py:158-205."""
import numpy as np
import pytest

from rlaifv_tpu.data.image_processing import (
    process_anyres_image,
    select_best_resolution,
)
from rlaifv_tpu.models.anyres import merge_anyres_features, unpad_grid


def test_unpad_grid_wide_image():
    grid = np.arange(8 * 12).reshape(8, 12, 1).astype(np.float32)
    out = unpad_grid(grid, original_size=(1200, 400))  # very wide -> crop rows
    assert out.shape[1] == 12 and out.shape[0] < 8


def test_unpad_grid_tall_image():
    grid = np.zeros((12, 8, 1), np.float32)
    out = unpad_grid(grid, original_size=(400, 1200))
    assert out.shape[0] == 12 and out.shape[1] < 8


def test_merge_flat():
    f = np.random.default_rng(0).normal(size=(3, 4, 5)).astype(np.float32)
    out = merge_anyres_features(f, (2, 1), merge_type="flat")
    np.testing.assert_array_equal(out, f.reshape(-1, 5))


def test_merge_spatial_matches_oracle():
    rng = np.random.default_rng(1)
    nh, nw, side, D = 2, 3, 2, 4
    views = rng.normal(size=(1 + nh * nw, side * side, D)).astype(np.float32)
    out = merge_anyres_features(views, (nw, nh), merge_type="spatial")

    # oracle restating llava_arch.py:181-183 permute/flatten chain
    pf = views[1:].reshape(nh, nw, side, side, D)
    pf = pf.transpose(0, 2, 1, 3, 4).reshape(nh * side, nw * side, D)
    want = np.concatenate([views[0], pf.reshape(-1, D)], axis=0)
    np.testing.assert_array_equal(out, want)


def test_merge_spatial_unpad_row_newlines():
    rng = np.random.default_rng(2)
    nh, nw, side, D = 2, 2, 3, 4
    views = rng.normal(size=(1 + nh * nw, side * side, D)).astype(np.float32)
    newline = np.full(D, 7.0, np.float32)
    # square original: no crop; every grid row gains one newline token
    out = merge_anyres_features(
        views, (nw, nh), merge_type="spatial_unpad",
        original_size=(600, 600), image_newline=newline,
    )
    H, W = nh * side, nw * side
    assert out.shape == (side * side + H * (W + 1), D)
    # last feature of the first grid row is the newline
    row0_end = side * side + W
    np.testing.assert_array_equal(out[row0_end], newline)


def test_anyres_host_geometry_roundtrip():
    from PIL import Image

    from rlaifv_tpu.data.image_processing import ClipImageProcessor

    img = Image.new("RGB", (700, 340), (10, 200, 30))
    pins = [(336, 336), (672, 336), (336, 672), (672, 672)]
    best = select_best_resolution(img.size, pins)
    assert best == (672, 336)  # wide image picks the wide grid
    proc = ClipImageProcessor(image_size=336)
    stack = process_anyres_image(img, proc, pins)
    # base + 2x1 grid
    assert stack.shape == (3, 336, 336, 3)
