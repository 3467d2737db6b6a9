"""ctypes bindings for the native C++ preprocessing library.

Compiles ``tramba_tpu/native/preprocess.cpp`` on first use (g++ -O3, cached
next to the source) and exposes PIL-bit-exact bilinear / nearest resize,
ImageNet normalization, and a threaded fused eval-batch preprocessor.  Falls
back cleanly (``available() == False``) if no compiler is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "native", "preprocess.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "libtramba_preprocess.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        try:
            if (not os.path.exists(_SO)) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
                     "-o", _SO, _SRC, "-lpthread"],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            f32p = ctypes.POINTER(ctypes.c_float)
            i64p = ctypes.POINTER(ctypes.c_int64)
            i32p = ctypes.POINTER(ctypes.c_int32)
            lib.resize_bilinear_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                               u8p, ctypes.c_int, ctypes.c_int]
            lib.resize_nearest_u8.argtypes = lib.resize_bilinear_u8.argtypes
            lib.normalize_f32.argtypes = [u8p, ctypes.c_int, ctypes.c_int, f32p, f32p, f32p]
            lib.preprocess_eval_batch.argtypes = [
                u8p, i64p, i32p, i32p, u8p, i64p, ctypes.c_int, ctypes.c_int,
                f32p, f32p, f32p, f32p, ctypes.c_int,
            ]
            _LIB = lib
        except Exception:
            _LIB = None
        return _LIB


def available() -> bool:
    return _load() is not None


def _u8(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def resize_bilinear(img: np.ndarray, size: int) -> np.ndarray:
    """(H, W, C) or (H, W) uint8 -> (size, size, ...) uint8; PIL-exact."""
    lib = _load()
    assert lib is not None
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    img = np.ascontiguousarray(img)
    h, w, c = img.shape
    out = np.empty((size, size, c), np.uint8)
    lib.resize_bilinear_u8(_u8(img), h, w, c, _u8(out), size, size)
    return out[..., 0] if squeeze else out


import functools


@functools.lru_cache(maxsize=None)
def _nearest_index(in_size: int, out_size: int) -> np.ndarray:
    """PIL-exact NEAREST source index per output position.

    PIL's mapping has float-accumulation quirks that defy a closed form, so
    the table is extracted from PIL itself on a 1-pixel index strip (cached).
    """
    from PIL import Image

    if in_size <= 255:
        strip = np.arange(in_size, dtype=np.uint8)[None, :]
        got = np.asarray(Image.fromarray(strip, "L").resize((out_size, 1), Image.NEAREST))[0]
        return got.astype(np.int64)
    lo = (np.arange(in_size) & 0xFF).astype(np.uint8)[None, :]
    hi = (np.arange(in_size) >> 8).astype(np.uint8)[None, :]
    glo = np.asarray(Image.fromarray(lo, "L").resize((out_size, 1), Image.NEAREST))[0]
    ghi = np.asarray(Image.fromarray(hi, "L").resize((out_size, 1), Image.NEAREST))[0]
    return (ghi.astype(np.int64) << 8) | glo.astype(np.int64)


def resize_nearest(img: np.ndarray, size: int) -> np.ndarray:
    """PIL-exact NEAREST resize via cached index tables + vectorized take."""
    h, w = img.shape[:2]
    rows = _nearest_index(h, size)
    cols = _nearest_index(w, size)
    return img[rows][:, cols]


def preprocess_eval_batch(images, masks, size: int, mean, std, num_threads: int = 8):
    """List of (H_i, W_i, 3) uint8 images + (H_i, W_i) masks -> normalized
    (N, size, size, 3) float32 batch and (N, size, size, 1) masks."""
    lib = _load()
    assert lib is not None
    n = len(images)
    img_flat = np.concatenate([np.ascontiguousarray(im).reshape(-1) for im in images])
    mask_flat = np.concatenate([np.ascontiguousarray(m).reshape(-1) for m in masks])
    img_off = np.zeros(n, np.int64)
    mask_off = np.zeros(n, np.int64)
    hs = np.asarray([im.shape[0] for im in images], np.int32)
    ws = np.asarray([im.shape[1] for im in images], np.int32)
    if n > 1:
        img_off[1:] = np.cumsum([im.size for im in images[:-1]])
        mask_off[1:] = np.cumsum([m.size for m in masks[:-1]])
    out_img = np.empty((n, size, size, 3), np.float32)
    out_mask = np.empty((n, size, size, 1), np.float32)
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    lib.preprocess_eval_batch(
        _u8(img_flat), img_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        hs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ws.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        _u8(mask_flat), mask_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n, size, _f32(mean), _f32(std), _f32(out_img), _f32(out_mask), num_threads,
    )
    # masks: PIL-exact nearest via cached index tables (C++ path approximates)
    for i, m in enumerate(masks):
        out_mask[i, :, :, 0] = resize_nearest(m, size).astype(np.float32) / 255.0
    return out_img, out_mask
