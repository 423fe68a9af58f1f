"""Fused device-side image preprocessing: resize (as matmuls) + normalize.

TPU-native replacement for the PIL/torchvision hot path (ref:
llava/mm_utils.py:152-182 expand2square + CLIP bicubic resize+normalize —
the `preprocess+encode ms/image` BASELINE metric). Design:

- bicubic resampling is expressed as two small matrix products
  out = Wr @ img @ Wc^T, which XLA tiles straight onto the MXU — no
  gather/scatter, no dynamic shapes. The (dst, src) weight matrices
  replicate PIL's filter exactly (support-2 bicubic a=-0.5, kernel widened
  by the scale factor when downsampling, weights normalized per row), so
  outputs match the host path to uint8 rounding.
- mean-pad-to-square runs on host (cheap memcpy, ragged by nature); the
  device fuses resize + uint8 rounding emulation + rescale + normalize in
  one jit (single HBM round-trip per image).
- one compiled program per source-size bucket; weight matrices are cached
  per (src, dst) pair host-side.

The same kernel serves CLIP-L/336 (LLaVA), EVA 448 (OmniLMM) and SigLIP 980
slices (MiniCPM-V) — only mean/std/size differ.
"""
from __future__ import annotations

import functools
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from rlaifv_tpu.constants import OPENAI_CLIP_MEAN, OPENAI_CLIP_STD


def _bicubic(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    """PIL's bicubic kernel (support 2)."""
    x = np.abs(x)
    out = np.where(
        x < 1.0,
        ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0,
        np.where(
            x < 2.0,
            (((x - 5.0) * x + 8.0) * x - 4.0) * a,
            0.0,
        ),
    )
    return out


@functools.lru_cache(maxsize=256)
def pil_resize_weights(src: int, dst: int) -> np.ndarray:
    """(dst, src) PIL-faithful bicubic resampling matrix (rows sum to 1)."""
    support = 2.0
    scale = src / dst
    filterscale = max(scale, 1.0)
    supp = support * filterscale
    W = np.zeros((dst, src), np.float32)
    for i in range(dst):
        center = (i + 0.5) * scale
        xmin = max(int(center - supp + 0.5), 0)
        xmax = min(int(center + supp + 0.5), src)
        xs = np.arange(xmin, xmax)
        w = _bicubic((xs + 0.5 - center) / filterscale)
        s = w.sum()
        if s != 0:
            w = w / s
        W[i, xmin:xmax] = w
    return W


def _resize_normalize(img_u8, Wr, Wc, mean, std, emulate_uint8: bool):
    """img (B, S, S, 3) uint8 -> (B, D, D, 3) float32 normalized.

    PIL resamples in two passes (horizontal, then vertical) and stores
    uint8 between passes — both roundings are emulated for parity.
    """
    x = img_u8.astype(jnp.float32)
    x = jnp.einsum("dw,bhwc->bhdc", Wc, x, preferred_element_type=jnp.float32)
    if emulate_uint8:
        x = jnp.clip(jnp.round(x), 0.0, 255.0)
    x = jnp.einsum("ds,bswc->bdwc", Wr, x, preferred_element_type=jnp.float32)
    if emulate_uint8:
        x = jnp.clip(jnp.round(x), 0.0, 255.0)
    x = x / 255.0
    return (x - mean) / std


class DeviceImagePipeline:
    """Batched pad→resize→normalize with per-source-size compiled programs.

    Drop-in device replacement for ClipImageProcessor (same numbers); host
    keeps JPEG decode + square padding, the device does everything dense.
    """

    def __init__(
        self,
        image_size: int = 336,
        mean: Sequence[float] = OPENAI_CLIP_MEAN,
        std: Sequence[float] = OPENAI_CLIP_STD,
        pad_to_square: bool = True,
        emulate_uint8: bool = True,
        size_bucket: int = 32,
    ):
        self.image_size = image_size
        self.mean = jnp.asarray(mean, jnp.float32)
        self.std = jnp.asarray(std, jnp.float32)
        self.pad_to_square = pad_to_square
        self.emulate_uint8 = emulate_uint8
        self.size_bucket = size_bucket
        self.background = tuple(
            int(x * 255) for x in np.asarray(mean)
        )
        self._fn = jax.jit(
            functools.partial(_resize_normalize,
                              emulate_uint8=emulate_uint8),
        )

    def _pad_square_host(self, arr: np.ndarray) -> np.ndarray:
        h, w, _ = arr.shape
        if h == w:
            return arr
        side = max(h, w)
        out = np.empty((side, side, 3), np.uint8)
        out[:] = np.asarray(self.background, np.uint8)
        top = (side - h) // 2
        left = (side - w) // 2
        out[top : top + h, left : left + w] = arr
        return out

    def _bucket(self, side: int) -> int:
        b = self.size_bucket
        return max(((side + b - 1) // b) * b, self.image_size)

    def __call__(self, images: Sequence[np.ndarray]) -> np.ndarray:
        """List of HWC uint8 arrays -> (B, D, D, 3) float32 normalized.

        Same-size groups batch into one device call.
        """
        arrs = []
        for im in images:
            arr = np.asarray(im, np.uint8)
            if self.pad_to_square:
                arr = self._pad_square_host(arr)
            arrs.append(arr)

        out = np.empty(
            (len(arrs), self.image_size, self.image_size, 3), np.float32
        )
        groups: Dict[int, list] = {}
        for idx, arr in enumerate(arrs):
            groups.setdefault(arr.shape[0], []).append(idx)

        for side, idxs in groups.items():
            batch = np.stack([arrs[i] for i in idxs])
            Wr = jnp.asarray(pil_resize_weights(side, self.image_size))
            res = self._fn(jnp.asarray(batch), Wr, Wr, self.mean, self.std)
            out[idxs] = np.asarray(res)
        return out
