"""anyres multi-view feature merging (LLaVA-1.6-style grids).

Rebuild of the reference merge logic (ref: llava/model/llava_arch.py:
158-205 `prepare_inputs_labels_for_multimodal` spatial branch and :101-121
`unpad_image`; host geometry in data/image_processing.py
process_anyres_image). RLAIF-V itself trains with aspect 'pad'
(llava15_train.sh:37), so this is completeness for the LLaVA API surface:
the merge math is implemented and tested; wiring variable-length merged
spans into the static-shape trainer is a bucketing exercise left to the
serving pipeline (PARITY.md known-gaps).

Views layout: features (1 + nh*nw, P², D) — view 0 is the base (square
resize), the rest are grid patches in row-major order.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def unpad_grid(grid: np.ndarray, original_size: Tuple[int, int]) -> np.ndarray:
    """Crop the letterbox padding from a (H, W, D) feature grid.

    original_size: (width, height) of the source image
    (ref unpad_image, llava_arch.py:101-121 — same ratio arithmetic).
    """
    ow, oh = original_size
    H, W = grid.shape[:2]
    original_ratio = ow / oh
    current_ratio = W / H
    if original_ratio > current_ratio:
        # padding on top/bottom
        scale = W / ow
        new_h = int(oh * scale)
        pad = (H - new_h) // 2
        return grid[pad : H - pad, :]
    scale = H / oh
    new_w = int(ow * scale)
    pad = (W - new_w) // 2
    return grid[:, pad : W - pad]


def merge_anyres_features(
    view_features: np.ndarray,  # (1 + nh*nw, P^2, D)
    grid_shape: Tuple[int, int],  # (num_patch_w, num_patch_h)
    *,
    merge_type: str = "spatial_unpad",
    original_size: Optional[Tuple[int, int]] = None,  # (w, h), for unpad
    image_newline: Optional[np.ndarray] = None,  # (D,), for unpad
) -> np.ndarray:
    """-> (T, D) merged feature sequence (T varies with merge_type).

    merge_type:
      'flat'          — all views flattened in order (llava_arch.py:167)
      'spatial'       — base ++ grid patches stitched spatially (:181-183)
      'spatial_unpad' — base ++ unpadded grid with a newline feature at the
                        end of every row (:173-180)
    """
    n_views, p2, D = view_features.shape
    side = int(round(p2 ** 0.5))
    assert side * side == p2, "views must be square patch grids"

    if merge_type == "flat":
        return view_features.reshape(-1, D)

    base = view_features[0]
    patches = view_features[1:]
    nw, nh = grid_shape
    assert patches.shape[0] == nw * nh, (
        f"grid {grid_shape} needs {nw * nh} patch views, got {patches.shape[0]}"
    )
    # (nh, nw, side, side, D) -> (nh*side, nw*side, D)
    grid = patches.reshape(nh, nw, side, side, D)
    grid = grid.transpose(0, 2, 1, 3, 4).reshape(nh * side, nw * side, D)

    if merge_type == "spatial":
        return np.concatenate([base, grid.reshape(-1, D)], axis=0)

    if merge_type == "spatial_unpad":
        assert original_size is not None and image_newline is not None
        grid = unpad_grid(grid, original_size)
        newline_col = np.broadcast_to(
            image_newline[None, None, :], (grid.shape[0], 1, D)
        )
        grid = np.concatenate([grid, newline_col], axis=1)
        return np.concatenate([base, grid.reshape(-1, D)], axis=0)

    raise ValueError(f"Unexpected mm_patch_merge_type: {merge_type}")


def encode_anyres(
    model,
    params,
    processor,
    cfg,
    image,
    *,
    image_newline: Optional[np.ndarray] = None,
    encode_fn=None,  # optional jitted (params, views) -> (V, P^2, D)
) -> np.ndarray:
    """Full anyres encode for inference: host geometry -> batched view
    encode on device -> host merge. -> (T, D) merged features to feed the
    engine's span splice (T varies per image; B=1 chat is the consumer).

    cfg: LlavaConfig with image_grid_pinpoints / mm_patch_merge_type set
    (ref llava_arch.py:150-205 anyres branch, done TPU-style: the views
    batch rides one encode call; the ragged merge stays on host).
    """
    from rlaifv_tpu.data.image_processing import process_anyres_image_full

    views, grid_shape, original_size = process_anyres_image_full(
        image, processor, cfg.image_grid_pinpoints
    )
    if encode_fn is None:
        def encode_fn(p, v):
            return model.apply({"params": p}, v, method=model.encode_images)
    feats = np.asarray(encode_fn(params, views), np.float32)
    return merge_anyres_features(
        feats,
        grid_shape,
        merge_type=cfg.mm_patch_merge_type,
        original_size=original_size,
        image_newline=image_newline,
    )
