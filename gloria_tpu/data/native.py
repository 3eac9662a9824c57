"""ctypes bindings for the native host-ingest kernel (native/ingest.cpp).

One call per batch: fused letterbox(area) + pad + channel-replicate +
normalize over a C++ thread pool, writing the final NHWC float32 buffer.
Falls back to the cv2/numpy path when the shared library hasn't been built
(``make -C native``); builds it on demand when a toolchain is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_LIB_PATH = Path(__file__).resolve().parents[2] / "native" / "libgloria_ingest.so"
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        try:  # build on demand
            subprocess.run(["make", "-C", str(_LIB_PATH.parent)], check=True,
                           stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.letterbox_normalize_batch.argtypes = [
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ]
        lib.letterbox_crop_normalize_batch.argtypes = [
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_float, ctypes.c_float, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.letterbox_u8_batch.argtypes = [
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.letterbox_crop_u8_batch.argtypes = [
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.ingest_abi_version.restype = ctypes.c_int
        assert lib.ingest_abi_version() == 3
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def letterbox_normalize_batch(
    images: list[np.ndarray], size: int, mean: float = 0.5, std: float = 0.5,
    num_threads: int = 0,
) -> np.ndarray:
    """Grayscale uint8 images (varying sizes) → [N, size, size, 3] float32,
    letterboxed and normalized ((x/255 - mean) / std)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native ingest library unavailable; run `make -C native`")
    n = len(images)
    images = [np.ascontiguousarray(im if im.ndim == 2 else im[..., 0], np.uint8) for im in images]
    ptrs = (ctypes.POINTER(ctypes.c_uint8) * n)(
        *[im.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for im in images]
    )
    heights = (ctypes.c_int * n)(*[im.shape[0] for im in images])
    widths = (ctypes.c_int * n)(*[im.shape[1] for im in images])
    out = np.empty((n, size, size, 3), np.float32)
    lib.letterbox_normalize_batch(
        ptrs, heights, widths, n, size, mean, std,
        num_threads or (os.cpu_count() or 4),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def letterbox_crop_normalize_batch(
    images: list[np.ndarray], size: int, crop_size: int,
    crop_tops: np.ndarray, crop_lefts: np.ndarray, flips: np.ndarray,
    mean: float = 0.5, std: float = 0.5, num_threads: int = 0,
) -> np.ndarray:
    """Training path: letterbox to `size`, crop `crop_size` at the given
    offsets, optional horizontal flip, normalize — one fused pass."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native ingest library unavailable; run `make -C native`")
    n = len(images)
    images = [np.ascontiguousarray(im if im.ndim == 2 else im[..., 0], np.uint8) for im in images]
    ptrs = (ctypes.POINTER(ctypes.c_uint8) * n)(
        *[im.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for im in images]
    )
    heights = (ctypes.c_int * n)(*[im.shape[0] for im in images])
    widths = (ctypes.c_int * n)(*[im.shape[1] for im in images])
    tops = (ctypes.c_int * n)(*[int(v) for v in crop_tops])
    lefts = (ctypes.c_int * n)(*[int(v) for v in crop_lefts])
    fl = (ctypes.c_int * n)(*[int(v) for v in flips])
    out = np.empty((n, crop_size, crop_size, 3), np.float32)
    lib.letterbox_crop_normalize_batch(
        ptrs, heights, widths, n, size, crop_size, tops, lefts, fl,
        mean, std, num_threads or (os.cpu_count() or 4),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def _u8_ptrs(images: list[np.ndarray]):
    n = len(images)
    images = [np.ascontiguousarray(im if im.ndim == 2 else im[..., 0], np.uint8)
              for im in images]
    ptrs = (ctypes.POINTER(ctypes.c_uint8) * n)(
        *[im.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for im in images]
    )
    heights = (ctypes.c_int * n)(*[im.shape[0] for im in images])
    widths = (ctypes.c_int * n)(*[im.shape[1] for im in images])
    return images, ptrs, heights, widths


def letterbox_u8_batch(images: list[np.ndarray], size: int,
                       num_threads: int = 0) -> np.ndarray:
    """Grayscale uint8 images → [N, size, size, 1] uint8, letterboxed, raw
    pixels (normalization happens on device; GLoRIA's uint8 input branch
    broadcasts C=1→3 and normalizes inside the jitted step)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native ingest library unavailable; run `make -C native`")
    images, ptrs, heights, widths = _u8_ptrs(images)
    n = len(images)
    out = np.empty((n, size, size), np.uint8)
    lib.letterbox_u8_batch(ptrs, heights, widths, n, size,
                           num_threads or (os.cpu_count() or 4),
                           out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out[..., None]


def letterbox_crop_u8_batch(
    images: list[np.ndarray], size: int, crop_size: int,
    crop_tops: np.ndarray, crop_lefts: np.ndarray, flips: np.ndarray,
    num_threads: int = 0,
) -> np.ndarray:
    """Training path, uint8 out: letterbox to `size`, crop `crop_size` at the
    given offsets, optional horizontal flip — raw pixels, [N, crop, crop, 1]."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native ingest library unavailable; run `make -C native`")
    images, ptrs, heights, widths = _u8_ptrs(images)
    n = len(images)
    tops = (ctypes.c_int * n)(*[int(v) for v in crop_tops])
    lefts = (ctypes.c_int * n)(*[int(v) for v in crop_lefts])
    fl = (ctypes.c_int * n)(*[int(v) for v in flips])
    out = np.empty((n, crop_size, crop_size), np.uint8)
    lib.letterbox_crop_u8_batch(ptrs, heights, widths, n, size, crop_size,
                                tops, lefts, fl,
                                num_threads or (os.cpu_count() or 4),
                                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out[..., None]
