"""Raw dataset loading from standard on-disk formats, with a deterministic
synthetic fallback.

The reference pulls torchvision datasets with download=True
(/root/reference/cdf_alignment/resnet-20-cifar-10/data/cifar10.py:22-30); this
environment has zero egress, so we read the same on-disk formats when present
(CIFAR-10 python pickles, SVHN .mat, MNIST idx) and otherwise generate a
class-structured synthetic set so every pipeline runs end-to-end.
"""

from __future__ import annotations

import gzip
import os
import pickle
import struct
from typing import Tuple

import numpy as np

Arrays = Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]

# torchvision normalization constants used by the reference
CIFAR10_MEAN = np.array([0.4914, 0.4822, 0.4465], np.float32)
CIFAR10_STD = np.array([0.2023, 0.1994, 0.2010], np.float32)
SVHN_MEAN = np.array([0.5, 0.5, 0.5], np.float32)  # svhn.py:15-22
SVHN_STD = np.array([0.5, 0.5, 0.5], np.float32)


def load_cifar10(data_dir: str) -> Arrays | None:
    """cifar-10-batches-py pickle format -> uint8 NHWC."""
    base = os.path.join(data_dir, "cifar-10-batches-py")
    if not os.path.isdir(base):
        return None

    def read_batch(name):
        with open(os.path.join(base, name), "rb") as f:
            d = pickle.load(f, encoding="bytes")
        x = d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        y = np.asarray(d[b"labels"], np.int32)
        return x, y

    xs, ys = zip(*(read_batch(f"data_batch_{i}") for i in range(1, 6)))
    tx, ty = read_batch("test_batch")
    return np.concatenate(xs), np.concatenate(ys), tx, ty


def load_svhn(data_dir: str) -> Arrays | None:
    """SVHN cropped-digit .mat format -> uint8 NHWC, labels 0-9."""
    tr = os.path.join(data_dir, "train_32x32.mat")
    te = os.path.join(data_dir, "test_32x32.mat")
    if not (os.path.isfile(tr) and os.path.isfile(te)):
        return None
    from scipy.io import loadmat

    def read(path):
        m = loadmat(path)
        x = np.transpose(m["X"], (3, 0, 1, 2))  # HWCN -> NHWC
        y = m["y"].reshape(-1).astype(np.int32) % 10  # 10 -> 0
        return x, y

    return (*read(tr), *read(te))


def _read_idx(path: str) -> np.ndarray:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        magic = struct.unpack(">I", f.read(4))[0]
        ndim = magic & 0xFF
        shape = struct.unpack(">" + "I" * ndim, f.read(4 * ndim))
        return np.frombuffer(f.read(), np.uint8).reshape(shape)


def load_mnist(data_dir: str, prefix: str = "") -> Arrays | None:
    """MNIST idx format (optionally gzipped) -> uint8 NHW1."""
    names = {
        "train_x": "train-images-idx3-ubyte",
        "train_y": "train-labels-idx1-ubyte",
        "test_x": "t10k-images-idx3-ubyte",
        "test_y": "t10k-labels-idx1-ubyte",
    }
    found = {}
    for k, n in names.items():
        for cand in (
            os.path.join(data_dir, prefix, n),
            os.path.join(data_dir, prefix, n + ".gz"),
            os.path.join(data_dir, "MNIST", "raw", n),
            os.path.join(data_dir, "MNIST", "raw", n + ".gz"),
        ):
            if os.path.isfile(cand):
                found[k] = cand
                break
        else:
            return None
    tx = _read_idx(found["train_x"])[..., None]
    ty = _read_idx(found["train_y"]).astype(np.int32)
    ex = _read_idx(found["test_x"])[..., None]
    ey = _read_idx(found["test_y"]).astype(np.int32)
    return tx, ty, ex, ey


def synthetic(
    n_train: int = 2048,
    n_test: int = 512,
    shape: Tuple[int, int, int] = (32, 32, 3),
    num_classes: int = 10,
    seed: int = 0,
) -> Arrays:
    """Deterministic, learnable synthetic image classification data.

    Each class gets a fixed low-frequency template; samples are template +
    noise, quantized to uint8 — so accuracy curves behave like a real
    (easy) dataset and pipelines/benchmarks are runnable with zero egress.
    """
    rng = np.random.RandomState(seed)
    h, w, c = shape
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    templates = []
    for k in range(num_classes):
        fx, fy = rng.uniform(0.5, 2.5, 2)
        px, py = rng.uniform(0, 2 * np.pi, 2)
        base = np.sin(2 * np.pi * fx * xx / w + px) * np.cos(
            2 * np.pi * fy * yy / h + py
        )
        tpl = np.stack([base * rng.uniform(0.5, 1.0) for _ in range(c)], -1)
        templates.append(tpl)
    templates = np.stack(templates)  # (K, H, W, C)

    def make(n, seed_off):
        r = np.random.RandomState(seed + seed_off)
        y = r.randint(0, num_classes, n).astype(np.int32)
        x = templates[y] * 0.5 + r.randn(n, h, w, c).astype(np.float32) * 0.25
        x = np.clip((x + 1.0) / 2.0, 0, 1)
        return (x * 255).astype(np.uint8), y

    tx, ty = make(n_train, 1)
    ex, ey = make(n_test, 2)
    return tx, ty, ex, ey
