"""Dataset registry: name -> Data(loader_train, loader_test).

Reference equivalents: data/cifar10.py, data/svhn.py per project; the
synthetic fallback stands in when the on-disk dataset is absent
(zero-egress environment)."""

from __future__ import annotations

import logging

import numpy as np

from alignq_tpu.data import datasets
from alignq_tpu.data.loader import ArrayLoader, Data

log = logging.getLogger(__name__)


def _cifar_like(
    arrays,
    train_bs: int,
    eval_bs: int,
    seed: int,
    mean: np.ndarray,
    std: np.ndarray,
    train_augment: bool,
):
    from alignq_tpu.data import native_augment

    tx, ty, ex, ey = arrays
    if train_augment:
        # fused native crop+flip+normalize when native/libaugment.so is
        # built; numpy fallback otherwise (same rng stream either way)
        def aug(b, rng):
            return native_augment.augment_normalize(b, rng, mean, std)

        train = ArrayLoader(
            tx, ty, train_bs, shuffle=True, drop_remainder=True,
            augment_fn=aug, seed=seed,
        )
    else:
        train = ArrayLoader(
            tx, ty, train_bs, shuffle=True, drop_remainder=True,
            transform_fn=lambda b: native_augment.normalize_only(b, mean, std),
            seed=seed,
        )
    test = ArrayLoader(
        ex, ey, eval_bs, shuffle=False, drop_remainder=True,
        transform_fn=lambda b: native_augment.normalize_only(b, mean, std),
    )
    return Data(train, test)


def get_data(
    name: str,
    data_dir: str,
    train_batch_size: int,
    eval_batch_size: int,
    seed: int = 0,
) -> Data:
    name = name.lower()
    if name == "cifar10":
        arrays = datasets.load_cifar10(data_dir)
        if arrays is None:
            log.warning("cifar10 not found under %s — using synthetic data", data_dir)
            arrays = datasets.synthetic(seed=seed)
        # RandomCrop(32,4)+flip+norm (reference cifar10.py:11-16)
        return _cifar_like(
            arrays, train_batch_size, eval_batch_size, seed,
            datasets.CIFAR10_MEAN, datasets.CIFAR10_STD, train_augment=True,
        )
    if name == "svhn":
        arrays = datasets.load_svhn(data_dir)
        if arrays is None:
            log.warning("svhn not found under %s — using synthetic data", data_dir)
            arrays = datasets.synthetic(seed=seed)
        # SVHN: normalize only, no crop/flip (reference svhn.py:15-22)
        return _cifar_like(
            arrays, train_batch_size, eval_batch_size, seed,
            datasets.SVHN_MEAN, datasets.SVHN_STD, train_augment=False,
        )
    if name == "synthetic":
        arrays = datasets.synthetic(seed=seed)
        return _cifar_like(
            arrays, train_batch_size, eval_batch_size, seed,
            datasets.CIFAR10_MEAN, datasets.CIFAR10_STD, train_augment=True,
        )
    raise ValueError(f"unknown dataset {name!r}")
