"""Data layer tests: IDX/CIFAR parsers, padded loaders, code datasets."""
import gzip
import struct

import numpy as np
import pytest

from vqvae_tpu.data import load_dataset, get_data_loaders
from vqvae_tpu.data.codes import CodesDataset, VanillaCodesDataset, get_code_loaders
from vqvae_tpu.data.datasets import CIFAR10_MEAN, CIFAR10_STD


def _write_idx(tmp_path, n=32):
    raw = tmp_path / "FashionMNIST" / "raw"
    raw.mkdir(parents=True)
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (n, 28, 28), dtype=np.uint8)
    labels = rng.randint(0, 10, n, dtype=np.uint8)
    for train, prefix in [(True, "train"), (False, "t10k")]:
        with open(raw / f"{prefix}-images-idx3-ubyte", "wb") as f:
            f.write(struct.pack(">IIII", 2051, n, 28, 28))
            f.write(imgs.tobytes())
        # gzip the labels to exercise the .gz path
        with gzip.open(raw / f"{prefix}-labels-idx1-ubyte.gz", "wb") as f:
            f.write(struct.pack(">II", 2049, n))
            f.write(labels.tobytes())
    return imgs, labels


def test_idx_parser_roundtrip(tmp_path):
    imgs, labels = _write_idx(tmp_path)
    split = load_dataset("FashionMNIST", root=tmp_path, train=True)
    assert split.images.shape == (32, 28, 28, 1)
    np.testing.assert_allclose(split.images[..., 0], imgs / 255.0, atol=1e-6)
    np.testing.assert_array_equal(split.labels, labels)
    assert not split.normalized


def test_synthetic_fallback_deterministic(tmp_path):
    a = load_dataset("MNIST", root=tmp_path / "empty", synthetic_size=64)
    b = load_dataset("MNIST", root=tmp_path / "empty", synthetic_size=64)
    np.testing.assert_array_equal(a.images, b.images)
    assert a.images.shape == (64, 28, 28, 1)
    assert set(np.unique(a.labels)) <= set(range(10))


def test_cifar_synthetic_normalized():
    split = load_dataset("CIFAR10", root="/nonexistent", synthetic_size=16)
    assert split.normalized
    x01 = split.denormalize(split.images)
    assert x01.min() > -0.01 and x01.max() < 1.01
    # round trip
    renorm = (x01 - CIFAR10_MEAN) / CIFAR10_STD
    np.testing.assert_allclose(renorm, split.images, atol=1e-5)


def test_loader_pads_final_batch():
    train, val = get_data_loaders("FashionMNIST", batch_size=48,
                                  synthetic_size=100, seed=0)
    batches = list(train.epoch(0))
    assert len(batches) == 3
    imgs, labels, mask = batches[-1]
    assert imgs.shape[0] == 48
    assert mask.sum() == 100 - 2 * 48
    total_valid = sum(b[2].sum() for b in batches)
    assert total_valid == 100


def test_loader_shuffle_differs_by_epoch():
    train, _ = get_data_loaders("FashionMNIST", batch_size=32,
                                synthetic_size=64, seed=0)
    a = next(iter(train.epoch(0)))[1]
    b = next(iter(train.epoch(1)))[1]
    assert not np.array_equal(a, b)


def test_codes_dataset_filters_minus_one(tmp_path):
    codes = np.random.RandomState(0).randint(0, 16, (10, 4, 4)).astype(np.int32)
    codes[3, 1, 2] = -1
    codes[7, 0, 0] = -1
    p = tmp_path / "codes.npy"
    np.save(p, codes)
    ds = CodesDataset(str(p))
    assert len(ds) == 8
    x, y, _ = ds.arrays()
    assert x.shape == (8, 15) and y.shape == (8, 15)
    np.testing.assert_array_equal(x[:, 1:], y[:, :-1])  # shifted pair


def test_vanilla_codes_bos(tmp_path):
    codes = np.asarray([0, 5, -1, 3], np.int32)
    p = tmp_path / "codes.npy"
    np.save(p, codes)
    ds = VanillaCodesDataset(str(p), num_tokens=16)
    assert len(ds) == 3
    x, y, _ = ds.arrays()
    assert (x == 15).all()  # BOS = num_tokens - 1
    np.testing.assert_array_equal(y[:, 0], [0, 5, 3])


def test_code_loaders_with_npz_labels(tmp_path):
    codes = np.random.RandomState(1).randint(0, 8, (20, 4, 4)).astype(np.int32)
    np.save(tmp_path / "codes.npy", codes)
    labels = np.random.RandomState(2).randint(0, 10, 20).astype(np.int32)
    np.save(tmp_path / "labels.npy", labels)
    train, val = get_code_loaders(str(tmp_path / "codes.npy"),
                                  str(tmp_path / "labels.npy"),
                                  batch_size=8)
    x, y, lab, mask = next(iter(train))
    assert x.shape == (8, 15)
    assert lab.shape == (8,)
