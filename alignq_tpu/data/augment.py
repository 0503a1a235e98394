"""Vectorized numpy batch augmentation.

Matches the reference torchvision transforms
(/root/reference/cdf_alignment/resnet-20-cifar-10/data/cifar10.py:11-21):
RandomCrop(32, padding=4) + RandomHorizontalFlip + Normalize — implemented
batched (one gather for the whole batch) instead of per-sample PIL ops.
"""

from __future__ import annotations

import numpy as np


def random_crop_flip(
    x: np.ndarray, rng: np.random.RandomState, pad: int = 4
) -> np.ndarray:
    """Batched pad-and-crop + horizontal flip on uint8/float NHWC."""
    n, h, w, c = x.shape
    xp = np.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="constant")
    oy = rng.randint(0, 2 * pad + 1, n)
    ox = rng.randint(0, 2 * pad + 1, n)
    # strided gather: build index grids once, offset per sample
    rows = oy[:, None] + np.arange(h)[None, :]
    cols = ox[:, None] + np.arange(w)[None, :]
    out = xp[np.arange(n)[:, None, None], rows[:, :, None], cols[:, None, :]]
    flip = rng.rand(n) < 0.5
    out[flip] = out[flip, :, ::-1]
    return out


def normalize(x: np.ndarray, mean: np.ndarray, std: np.ndarray) -> np.ndarray:
    """uint8 [0,255] -> float32 normalized (ToTensor + Normalize)."""
    return (x.astype(np.float32) / 255.0 - mean) / std
