"""Office-31 domain-adaptation data.

Reference:
- ImageFolder pipeline 256 -> 224 crops:
  /root/reference/cdf_alignment/dann_office/data/office.py:13-38
- 80/20 train/test file splitter, seed=1:
  /root/reference/cdf_alignment/dann_office/data/split.py:6-49 (the reference
  physically copies files; we split index lists — same assignment, no IO).

With no Office-31 images on disk (zero egress), a two-domain synthetic set
stands in: same class templates, domain-specific color/contrast shift — so
the DA pipelines (GRL ramps, dual loaders, LMMD) exercise a real domain gap.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

from alignq_tpu.data.datasets import synthetic
from alignq_tpu.data.loader import ArrayLoader

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def split_train_test(
    n: int, train_frac: float = 0.8, seed: int = 1
) -> Tuple[np.ndarray, np.ndarray]:
    """Deterministic 80/20 split (split.py:34-37 uses random.seed(1))."""
    rng = np.random.RandomState(seed)
    idx = rng.permutation(n)
    k = int(n * train_frac)
    return idx[:k], idx[k:]


def load_image_folder(root: str, image_size: int = 224) -> tuple | None:
    """Read an ImageFolder tree (class subdirs of images) into arrays."""
    if not os.path.isdir(root):
        return None
    try:
        from PIL import Image
    except ImportError:
        return None
    classes = sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
    )
    xs, ys = [], []
    for ci, cname in enumerate(classes):
        cdir = os.path.join(root, cname)
        for fname in sorted(os.listdir(cdir)):
            try:
                img = Image.open(os.path.join(cdir, fname)).convert("RGB")
            except Exception:
                continue
            img = img.resize((image_size, image_size))
            xs.append(np.asarray(img, np.uint8))
            ys.append(ci)
    if not xs:
        return None
    return np.stack(xs), np.asarray(ys, np.int32)


def synthetic_domain(
    domain: str, n: int, num_classes: int = 31, image_size: int = 64, seed: int = 0
):
    """Class templates shared across domains; per-domain photometric shift.

    The domain shift seeds from a DETERMINISTIC digest of the name — NOT
    Python hash(), whose per-process randomization (PYTHONHASHSEED) made
    each process of a multihost run generate different pixels for the same
    domain, breaking the host-identical-global-batch contract
    (dist/multihost.py local_batch_slice; caught by
    tests/test_multihost.py::test_two_process_fit_dann_matches_single)."""
    import zlib

    x, y, _, _ = synthetic(
        n_train=n, n_test=1, shape=(image_size, image_size, 3),
        num_classes=num_classes, seed=seed,
    )
    rng = np.random.RandomState(zlib.crc32(domain.encode()) % (2**31))
    gain = rng.uniform(0.6, 1.4, (1, 1, 1, 3)).astype(np.float32)
    bias = rng.uniform(-30, 30, (1, 1, 1, 3)).astype(np.float32)
    x = np.clip(x.astype(np.float32) * gain + bias, 0, 255).astype(np.uint8)
    return x, y


def get_office_domain(
    data_dir: str,
    domain: str,
    batch_size: int,
    *,
    train: bool,
    train_split: float = 0.8,
    seed: int = 1,
    image_size: int = 224,
    num_classes: int = 31,
) -> ArrayLoader:
    """One domain's loader ('amazon' | 'dslr' | 'webcam')."""
    loaded = load_image_folder(
        os.path.join(data_dir, "office31", domain, "images"), image_size
    )
    if loaded is None:
        x, y = synthetic_domain(domain, 1024, num_classes, min(image_size, 64), seed)
    else:
        x, y = loaded
    tr_idx, te_idx = split_train_test(len(x), train_split, seed)
    idx = tr_idx if train else te_idx

    def norm(b):
        return (b.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD

    return ArrayLoader(
        x[idx], y[idx], batch_size, shuffle=train, drop_remainder=True,
        transform_fn=norm, seed=seed,
    )


def get_office_pair(
    data_dir: str, src: str, tgt: str, batch_size: int, eval_batch_size: int,
    seed: int = 1, image_size: int = 224,
) -> dict:
    """Source/target loader bundle for the DA drivers
    (dann_office/main.py:344-347 zips src/tgt train loaders)."""
    return {
        "src_train": get_office_domain(data_dir, src, batch_size, train=True, seed=seed, image_size=image_size),
        "tgt_train": get_office_domain(data_dir, tgt, batch_size, train=True, seed=seed, image_size=image_size),
        "src_test": get_office_domain(data_dir, src, eval_batch_size, train=False, seed=seed, image_size=image_size),
        "tgt_test": get_office_domain(data_dir, tgt, eval_batch_size, train=False, seed=seed, image_size=image_size),
    }
