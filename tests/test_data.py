"""Data pipelines: loaders, augmentation, determinism."""

import numpy as np

from alignq_tpu.data import augment, datasets
from alignq_tpu.data.loader import ArrayLoader
from alignq_tpu.data.registry import get_data


class TestSynthetic:
    def test_deterministic(self):
        a = datasets.synthetic(n_train=64, n_test=32, seed=3)
        b = datasets.synthetic(n_train=64, n_test=32, seed=3)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)

    def test_shapes_and_dtype(self):
        tx, ty, ex, ey = datasets.synthetic(n_train=64, n_test=32)
        assert tx.shape == (64, 32, 32, 3) and tx.dtype == np.uint8
        assert ty.shape == (64,) and ty.dtype == np.int32
        assert set(np.unique(ty)) <= set(range(10))

    def test_learnable_structure(self):
        # same-class samples are more similar than cross-class on average
        tx, ty, _, _ = datasets.synthetic(n_train=256, seed=0)
        x = tx.astype(np.float32) / 255.0
        c0 = x[ty == 0]
        c1 = x[ty == 1]
        within = np.mean(np.abs(c0[:10, None] - c0[None, :10]))
        across = np.mean(np.abs(c0[:10, None] - c1[None, :10]))
        assert across > within


class TestAugment:
    def test_crop_shape_preserved(self):
        x = np.random.RandomState(0).randint(0, 255, (8, 32, 32, 3), dtype=np.uint8)
        out = augment.random_crop_flip(x, np.random.RandomState(1))
        assert out.shape == x.shape

    def test_normalize_range(self):
        x = np.full((2, 4, 4, 3), 255, np.uint8)
        out = augment.normalize(x, datasets.CIFAR10_MEAN, datasets.CIFAR10_STD)
        want = (1.0 - datasets.CIFAR10_MEAN) / datasets.CIFAR10_STD
        np.testing.assert_allclose(out[0, 0, 0], want, rtol=1e-5)

    def test_crop_content_comes_from_padded_source(self):
        x = np.arange(2 * 8 * 8 * 1, dtype=np.uint8).reshape(2, 8, 8, 1)
        out = augment.random_crop_flip(x, np.random.RandomState(2), pad=2)
        # all nonzero values must exist in the original
        orig = set(x.reshape(-1).tolist()) | {0}
        assert set(out.reshape(-1).tolist()) <= orig


class TestLoader:
    def test_drop_remainder_static_batches(self):
        x = np.zeros((50, 4, 4, 1), np.uint8)
        y = np.zeros((50,), np.int32)
        loader = ArrayLoader(x, y, 16, drop_remainder=True, prefetch=0)
        batches = list(loader)
        assert len(batches) == 3 == len(loader)
        assert all(b[0].shape[0] == 16 for b in batches)

    def test_shuffle_differs_by_epoch_but_reproducible(self):
        x = np.arange(32, dtype=np.uint8).reshape(32, 1, 1, 1)
        y = np.arange(32, dtype=np.int32)
        l1 = ArrayLoader(x, y, 32, shuffle=True, seed=7, prefetch=0)
        e1 = next(iter(l1))[1]
        e2 = next(iter(l1))[1]
        assert not np.array_equal(e1, e2)
        l2 = ArrayLoader(x, y, 32, shuffle=True, seed=7, prefetch=0)
        np.testing.assert_array_equal(e1, next(iter(l2))[1])

    def test_prefetch_equals_sync(self):
        x = np.random.RandomState(0).randint(0, 255, (64, 4, 4, 1), dtype=np.uint8)
        y = np.arange(64, dtype=np.int32)
        sync = ArrayLoader(x, y, 16, shuffle=True, seed=1, prefetch=0)
        pre = ArrayLoader(x, y, 16, shuffle=True, seed=1, prefetch=2)
        for (xa, ya), (xb, yb) in zip(sync, pre):
            np.testing.assert_array_equal(xa, xb)
            np.testing.assert_array_equal(ya, yb)


class TestRegistry:
    def test_synthetic_fallback_for_missing_cifar(self):
        data = get_data("cifar10", "/nonexistent_dir", 16, 16)
        xb, yb = next(iter(data.loader_train))
        assert xb.shape == (16, 32, 32, 3) and xb.dtype == np.float32
        assert yb.shape == (16,)

    def test_unknown_dataset_raises(self):
        import pytest

        with pytest.raises(ValueError):
            get_data("imagenet21k", "/tmp", 8, 8)


class TestNativeAugment:
    def test_native_matches_numpy_fallback(self):
        import alignq_tpu.data.native_augment as na
        from alignq_tpu.data.datasets import CIFAR10_MEAN, CIFAR10_STD

        x = np.random.RandomState(0).randint(0, 256, (16, 32, 32, 3), dtype=np.uint8)
        r1, r2 = np.random.RandomState(5), np.random.RandomState(5)
        out_a = na.augment_normalize(x, r1, CIFAR10_MEAN, CIFAR10_STD)
        saved, na._LIB = na._LIB, None
        try:
            out_b = na.augment_normalize(x, r2, CIFAR10_MEAN, CIFAR10_STD)
        finally:
            na._LIB = saved
        np.testing.assert_allclose(out_a, out_b, atol=1e-5)

    def test_normalize_only(self):
        import alignq_tpu.data.native_augment as na
        from alignq_tpu.data.datasets import CIFAR10_MEAN, CIFAR10_STD

        x = np.full((2, 4, 4, 3), 128, np.uint8)
        out = na.normalize_only(x, CIFAR10_MEAN, CIFAR10_STD)
        want = (128 / 255.0 - CIFAR10_MEAN) / CIFAR10_STD
        np.testing.assert_allclose(out[0, 0, 0], want, rtol=1e-5)
