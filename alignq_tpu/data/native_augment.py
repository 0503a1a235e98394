"""ctypes bindings for the native C++ augmentation kernel (native/augment.cpp).

Falls back to the numpy implementation (data/augment.py) when the shared
library has not been built (`make -C native`). The native path fuses
pad+crop+flip+normalize into one multithreaded pass — the numpy version
materializes a padded copy and a gather per batch.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "..", "..", "native", "libaugment.so")
    path = os.path.abspath(path)
    if not os.path.isfile(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.augment_batch.argtypes = [
            u8p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            i32p, i32p, u8p, f32p, f32p, ctypes.c_int, ctypes.c_int,
        ]
        lib.augment_batch.restype = None
        lib.normalize_batch.argtypes = [
            u8p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p, f32p, ctypes.c_int,
        ]
        lib.normalize_batch.restype = None
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def augment_normalize(
    x: np.ndarray,
    rng: np.random.RandomState,
    mean: np.ndarray,
    std: np.ndarray,
    pad: int = 4,
    num_threads: int = 8,
) -> np.ndarray:
    """Fused crop+flip+normalize. x uint8 NHWC -> float32 NHWC."""
    lib = _load()
    n, h, w, c = x.shape
    oy = rng.randint(0, 2 * pad + 1, n).astype(np.int32)
    ox = rng.randint(0, 2 * pad + 1, n).astype(np.int32)
    flip = (rng.rand(n) < 0.5).astype(np.uint8)
    if lib is None:
        from alignq_tpu.data.augment import normalize

        xp = np.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        rows = oy[:, None] + np.arange(h)[None, :]
        cols = ox[:, None] + np.arange(w)[None, :]
        out = xp[np.arange(n)[:, None, None], rows[:, :, None], cols[:, None, :]]
        out[flip.astype(bool)] = out[flip.astype(bool), :, ::-1]
        return normalize(out, mean, std)
    x = np.ascontiguousarray(x)
    out = np.empty((n, h, w, c), np.float32)
    lib.augment_batch(
        x, out, n, h, w, c, oy, ox, flip,
        np.ascontiguousarray(mean, np.float32),
        np.ascontiguousarray(std, np.float32),
        pad, num_threads,
    )
    return out


def normalize_only(
    x: np.ndarray, mean: np.ndarray, std: np.ndarray, num_threads: int = 8
) -> np.ndarray:
    lib = _load()
    if lib is None:
        from alignq_tpu.data.augment import normalize

        return normalize(x, mean, std)
    x = np.ascontiguousarray(x)
    n, h, w, c = x.shape
    out = np.empty((n, h, w, c), np.float32)
    lib.normalize_batch(
        x, out, n, h, w, c,
        np.ascontiguousarray(mean, np.float32),
        np.ascontiguousarray(std, np.float32),
        num_threads,
    )
    return out
