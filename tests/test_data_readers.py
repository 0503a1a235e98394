"""Golden-file tests for the real on-disk dataset readers (VERDICT.md
round-1 item 8): tiny fabricated files in the exact formats torchvision /
the reference produce, so the first real dataset drop-in works unchanged.

Formats: CIFAR-10 python pickles (cifar10.py:22-30 pulls torchvision's
cifar-10-batches-py), SVHN cropped .mat (svhn.py), MNIST idx
(dann_digit/data/mnist.py), MNIST-M pickle (mnistm_.py:10+), Office/
SynDigits ImageFolder trees (dann_office/data/office.py:13-38).
"""

import gzip
import os
import pickle
import struct

import numpy as np
import pytest

from alignq_tpu.data import datasets
from alignq_tpu.data.digits import get_digit_domain, load_mnistm
from alignq_tpu.data.office import load_image_folder, split_train_test


def _write_cifar10(root, n_per_batch=4):
    base = os.path.join(root, "cifar-10-batches-py")
    os.makedirs(base)
    rng = np.random.RandomState(0)

    def batch(path, off):
        data = rng.randint(0, 256, (n_per_batch, 3072), dtype=np.uint8)
        labels = [int(v) for v in rng.randint(0, 10, n_per_batch)]
        with open(path, "wb") as f:
            pickle.dump({b"data": data, b"labels": labels,
                         b"filenames": [b"x.png"] * n_per_batch}, f)
        return data, labels

    train = [batch(os.path.join(base, f"data_batch_{i}"), i)
             for i in range(1, 6)]
    test = batch(os.path.join(base, "test_batch"), 0)
    return train, test


class TestCifar10Reader:
    def test_roundtrip(self, tmp_path):
        train, test = _write_cifar10(str(tmp_path))
        out = datasets.load_cifar10(str(tmp_path))
        assert out is not None
        tx, ty, ex, ey = out
        assert tx.shape == (20, 32, 32, 3) and tx.dtype == np.uint8
        assert ex.shape == (4, 32, 32, 3)
        # CHW pickle layout -> HWC: red plane first
        want0 = train[0][0][0].reshape(3, 32, 32).transpose(1, 2, 0)
        np.testing.assert_array_equal(tx[0], want0)
        np.testing.assert_array_equal(ty[:4], np.asarray(train[0][1]))
        np.testing.assert_array_equal(ey, np.asarray(test[1]))

    def test_missing_dir_returns_none(self, tmp_path):
        assert datasets.load_cifar10(str(tmp_path / "nope")) is None


class TestSvhnReader:
    def test_roundtrip(self, tmp_path):
        scipy_io = pytest.importorskip("scipy.io")
        rng = np.random.RandomState(1)
        x = rng.randint(0, 256, (32, 32, 3, 6), dtype=np.uint8)  # HWCN
        y = np.array([[1], [2], [10], [5], [10], [9]], dtype=np.uint8)
        scipy_io.savemat(str(tmp_path / "train_32x32.mat"), {"X": x, "y": y})
        scipy_io.savemat(str(tmp_path / "test_32x32.mat"), {"X": x, "y": y})
        out = datasets.load_svhn(str(tmp_path))
        assert out is not None
        tx, ty, ex, ey = out
        assert tx.shape == (6, 32, 32, 3)
        np.testing.assert_array_equal(tx[3], x[..., 3])
        # label 10 means digit 0 (torchvision convention)
        np.testing.assert_array_equal(ty, [1, 2, 0, 5, 0, 9])

    def test_missing_files_return_none(self, tmp_path):
        assert datasets.load_svhn(str(tmp_path)) is None


def _write_idx(path, arr, gz=False):
    ndim = arr.ndim
    magic = 0x0800 | ndim  # 0x08 = uint8 dtype
    header = struct.pack(">I", magic) + b"".join(
        struct.pack(">I", s) for s in arr.shape
    )
    opener = gzip.open if gz else open
    with opener(path, "wb") as f:
        f.write(header + arr.tobytes())


class TestMnistReader:
    @pytest.mark.parametrize("gz", [False, True])
    def test_roundtrip(self, tmp_path, gz):
        rng = np.random.RandomState(2)
        imgs = rng.randint(0, 256, (5, 28, 28), dtype=np.uint8)
        labels = np.array([3, 1, 4, 1, 5], np.uint8)
        timgs = imgs[:2]
        tlabels = labels[:2]
        sfx = ".gz" if gz else ""
        _write_idx(str(tmp_path / f"train-images-idx3-ubyte{sfx}"), imgs, gz)
        _write_idx(str(tmp_path / f"train-labels-idx1-ubyte{sfx}"), labels, gz)
        _write_idx(str(tmp_path / f"t10k-images-idx3-ubyte{sfx}"), timgs, gz)
        _write_idx(str(tmp_path / f"t10k-labels-idx1-ubyte{sfx}"), tlabels, gz)
        out = datasets.load_mnist(str(tmp_path))
        assert out is not None
        tx, ty, ex, ey = out
        assert tx.shape == (5, 28, 28, 1) and tx.dtype == np.uint8
        np.testing.assert_array_equal(tx[..., 0], imgs)
        np.testing.assert_array_equal(ty, labels.astype(np.int32))
        assert ex.shape == (2, 28, 28, 1)
        np.testing.assert_array_equal(ey, [3, 1])

    def test_torchvision_raw_layout(self, tmp_path):
        # torchvision puts files under MNIST/raw/
        raw = tmp_path / "MNIST" / "raw"
        os.makedirs(raw)
        imgs = np.zeros((2, 28, 28), np.uint8)
        labels = np.array([7, 8], np.uint8)
        _write_idx(str(raw / "train-images-idx3-ubyte"), imgs)
        _write_idx(str(raw / "train-labels-idx1-ubyte"), labels)
        _write_idx(str(raw / "t10k-images-idx3-ubyte"), imgs)
        _write_idx(str(raw / "t10k-labels-idx1-ubyte"), labels)
        out = datasets.load_mnist(str(tmp_path))
        assert out is not None and out[0].shape == (2, 28, 28, 1)


class TestMnistmReader:
    def test_pickle_roundtrip_and_loader(self, tmp_path):
        rng = np.random.RandomState(3)
        mk = lambda n: {  # noqa: E731
            "images": rng.randint(0, 256, (n, 28, 28, 3), dtype=np.uint8),
            "labels": rng.randint(0, 10, n).astype(np.int32),
        }
        d = {"train": mk(8), "valid": mk(2), "test": mk(4)}
        os.makedirs(tmp_path / "mnistm")
        with open(tmp_path / "mnistm" / "mnist_m_data.pkl", "wb") as f:
            pickle.dump(d, f)
        got = load_mnistm(str(tmp_path))
        assert got is not None
        np.testing.assert_array_equal(got["test"]["labels"], d["test"]["labels"])

        loader = get_digit_domain(
            "mnistm", str(tmp_path), batch_size=4, train=True, img_size=28
        )
        xb, yb = next(iter(loader))
        assert xb.shape == (4, 28, 28, 3) and xb.dtype == np.float32


class TestImageFolderReader:
    def test_roundtrip(self, tmp_path):
        Image = pytest.importorskip("PIL.Image")
        root = tmp_path / "amazon" / "images"
        for ci, cname in enumerate(["back_pack", "bike"]):
            d = root / cname
            os.makedirs(d)
            for j in range(3):
                arr = np.full((40, 50, 3), 40 * ci + j, np.uint8)
                Image.fromarray(arr).save(str(d / f"img_{j}.jpg"))
        out = load_image_folder(str(root), image_size=16)
        assert out is not None
        x, y = out
        assert x.shape == (6, 16, 16, 3) and x.dtype == np.uint8
        np.testing.assert_array_equal(y, [0, 0, 0, 1, 1, 1])
        # class order is sorted dirname order; pixel content survives resize
        assert abs(int(x[0, 0, 0, 0]) - 0) <= 2
        assert abs(int(x[3].mean()) - 40) <= 3

    def test_missing_root_returns_none(self, tmp_path):
        assert load_image_folder(str(tmp_path / "none")) is None


class TestSplit:
    def test_split_deterministic_80_20(self):
        tr1, te1 = split_train_test(100)
        tr2, te2 = split_train_test(100)
        np.testing.assert_array_equal(tr1, tr2)
        assert len(tr1) == 80 and len(te1) == 20
        assert sorted(np.concatenate([tr1, te1])) == list(range(100))


class TestSynDigitsFolder:
    def test_digit_domain_from_image_folder(self, tmp_path):
        Image = pytest.importorskip("PIL.Image")
        root = tmp_path / "syndigits"
        for ci in range(3):
            d = root / str(ci)
            os.makedirs(d)
            for j in range(10):
                arr = np.random.RandomState(ci * 10 + j).randint(
                    0, 256, (32, 32, 3), dtype=np.uint8
                )
                Image.fromarray(arr).save(str(d / f"{j}.png"))
        loader = get_digit_domain(
            "syndigits", str(tmp_path), batch_size=9, train=True, img_size=28
        )
        xb, yb = next(iter(loader))
        assert xb.shape == (9, 28, 28, 3)
        assert set(np.unique(yb)) <= {0, 1, 2}
