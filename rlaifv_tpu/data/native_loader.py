"""ctypes bindings + build for the native JPEG decode/pad loader.

The C++ source (rlaifv_tpu/native/image_loader.cpp) compiles on first use
with g++ -O3 -shared against system libjpeg; if the toolchain or library is
missing the loader transparently falls back to the PIL host path, keeping
every environment functional.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SRC = os.path.join(_NATIVE_DIR, "image_loader.cpp")
_SO = os.path.join(_NATIVE_DIR, "libimage_loader.so")

_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return ctypes.CDLL(_SO)
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
             "-o", _SO, "-ljpeg", "-pthread"],
            check=True, capture_output=True, timeout=120,
        )
        return ctypes.CDLL(_SO)
    except (subprocess.SubprocessError, OSError) as e:
        print(f"[native_loader] build failed ({e}); PIL fallback", flush=True)
        _build_failed = True
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    with _lock:
        if _lib is None and not _build_failed:
            _lib = _build()
            if _lib is not None:
                _lib.rlaifv_decode_pad_batch.restype = ctypes.c_int
                _lib.rlaifv_jpeg_dims.restype = ctypes.c_int
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def jpeg_dims(data: bytes) -> Optional[Tuple[int, int]]:
    lib = get_lib()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    if lib.rlaifv_jpeg_dims(buf, len(data), ctypes.byref(w), ctypes.byref(h)):
        return None
    return w.value, h.value


class NativeImageLoader:
    """Batch JPEG decode + expand2square pad on a C++ thread pool.

    __call__(jpeg_bytes_list) -> list of (side, side, 3) uint8 arrays,
    mean-background padded (ClipImageProcessor.background semantics).
    """

    def __init__(self, background: Sequence[int] = (122, 116, 104),
                 num_threads: Optional[int] = None):
        self.background = np.asarray(background, np.uint8)
        self.num_threads = num_threads or min(16, os.cpu_count() or 4)

    def _fallback(self, blobs: Sequence[bytes]) -> List[np.ndarray]:
        from rlaifv_tpu.data.image_processing import decode_image

        out = []
        bg = self.background
        for blob in blobs:
            arr = np.asarray(decode_image(blob), np.uint8)
            h, w, _ = arr.shape
            side = max(h, w)
            canvas = np.empty((side, side, 3), np.uint8)
            canvas[:] = bg
            top, left = (side - h) // 2, (side - w) // 2
            canvas[top : top + h, left : left + w] = arr
            out.append(canvas)
        return out

    def __call__(self, blobs: Sequence[bytes]) -> List[np.ndarray]:
        lib = get_lib()
        if lib is None:
            return self._fallback(blobs)

        n = len(blobs)
        dims = []
        for blob in blobs:
            d = jpeg_dims(blob)
            if d is None:
                return self._fallback(blobs)  # non-JPEG in the batch
            dims.append(d)

        sides = [max(w, h) for w, h in dims]
        outs = [np.empty((s, s, 3), np.uint8) for s in sides]

        data_ptrs = (ctypes.POINTER(ctypes.c_uint8) * n)()
        for i, blob in enumerate(blobs):
            # zero-copy: point straight at the bytes object's buffer (the
            # caller's list keeps the blobs alive across the call)
            data_ptrs[i] = ctypes.cast(
                ctypes.c_char_p(blob), ctypes.POINTER(ctypes.c_uint8)
            )
        size_arr = (ctypes.c_size_t * n)(*[len(b) for b in blobs])
        out_ptrs = (ctypes.POINTER(ctypes.c_uint8) * n)(
            *[o.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for o in outs]
        )
        side_arr = (ctypes.c_int * n)(*sides)
        bg = (ctypes.c_uint8 * 3)(*self.background.tolist())

        failures = lib.rlaifv_decode_pad_batch(
            data_ptrs, size_arr, n, out_ptrs, side_arr, bg, self.num_threads
        )
        if failures:
            return self._fallback(blobs)
        return outs
