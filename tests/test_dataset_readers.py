"""Roundtrip tests for the on-disk dataset readers.

``load_mnist`` and ``load_cifar10`` are the entry gate for every future
real-data parity run; synthesize tiny files in the EXACT on-disk formats
(IDX with big-endian magic 0x0803/0x0801 — odenet_mnist/data.py:6; the
cifar-10-batches-py pickle layout — odenet_cifar10/data.py:8) and assert
shapes, values, labels, and scaling survive the read.
"""
import gzip
import os
import pickle
import struct

import numpy as np
import pytest

from neural_ode_metasolver_tpu.data import load_cifar10, load_mnist


def _write_idx_images(path, arr: np.ndarray, gz=False):
    """IDX3: magic 0x00000803, then n/rows/cols as >u4, then raw bytes."""
    n, r, c = arr.shape
    payload = struct.pack(">IIII", 0x0803, n, r, c) + arr.astype(np.uint8).tobytes()
    opener = gzip.open if gz else open
    with opener(path, "wb") as f:
        f.write(payload)


def _write_idx_labels(path, labels: np.ndarray, gz=False):
    """IDX1: magic 0x00000801, then n as >u4, then raw bytes."""
    payload = struct.pack(">II", 0x0801, labels.shape[0]) + labels.astype(
        np.uint8
    ).tobytes()
    opener = gzip.open if gz else open
    with opener(path, "wb") as f:
        f.write(payload)


def _write_mnist_pair(root, prefix, imgs, labels, gz=False):
    ext = ".gz" if gz else ""
    _write_idx_images(
        os.path.join(root, f"{prefix}-images-idx3-ubyte{ext}"), imgs, gz
    )
    _write_idx_labels(
        os.path.join(root, f"{prefix}-labels-idx1-ubyte{ext}"), labels, gz
    )


@pytest.mark.parametrize("gz", [False, True])
def test_load_mnist_roundtrip(tmp_path, gz):
    rs = np.random.RandomState(0)
    train_imgs = (rs.rand(7, 28, 28) * 255).astype(np.uint8)
    train_lbls = np.array([0, 1, 2, 3, 4, 5, 9], np.uint8)
    test_imgs = (rs.rand(3, 28, 28) * 255).astype(np.uint8)
    test_lbls = np.array([7, 8, 6], np.uint8)
    _write_mnist_pair(tmp_path, "train", train_imgs, train_lbls, gz)
    _write_mnist_pair(tmp_path, "t10k", test_imgs, test_lbls, gz)

    ds = load_mnist(str(tmp_path), train=True)
    assert ds.images.shape == (7, 28, 28, 1)
    assert ds.images.dtype == np.float32
    assert ds.labels.tolist() == train_lbls.tolist()
    # exact ToTensor scaling: uint8 / 255
    np.testing.assert_allclose(
        ds.images[..., 0], train_imgs.astype(np.float32) / 255.0, rtol=0
    )

    dt = load_mnist(str(tmp_path), train=False)
    assert dt.images.shape == (3, 28, 28, 1)
    assert dt.labels.tolist() == test_lbls.tolist()


def test_load_mnist_nested_raw_dir(tmp_path):
    """The torchvision on-disk layout nests files in MNIST/raw/."""
    raw = tmp_path / "MNIST" / "raw"
    raw.mkdir(parents=True)
    imgs = np.arange(2 * 28 * 28, dtype=np.uint8).reshape(2, 28, 28) % 251
    _write_mnist_pair(raw, "train", imgs, np.array([3, 1], np.uint8))
    ds = load_mnist(str(tmp_path), train=True)
    assert ds.images.shape == (2, 28, 28, 1)
    assert ds.labels.tolist() == [3, 1]


def test_load_mnist_missing(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_mnist(str(tmp_path))


def _write_cifar_batch(path, imgs_nchw: np.ndarray, labels):
    """cifar-10-batches-py layout: dict with b'data' (N, 3072) uint8 rows in
    CHW channel order and b'labels' a plain python list."""
    d = {
        b"data": imgs_nchw.reshape(imgs_nchw.shape[0], -1),
        b"labels": [int(v) for v in labels],
    }
    with open(path, "wb") as f:
        pickle.dump(d, f)


def test_load_cifar10_roundtrip(tmp_path):
    base = tmp_path / "cifar-10-batches-py"
    base.mkdir()
    rs = np.random.RandomState(1)
    all_imgs, all_lbls = [], []
    for i in range(1, 6):
        imgs = (rs.rand(4, 3, 32, 32) * 255).astype(np.uint8)
        lbls = rs.randint(0, 10, size=4)
        _write_cifar_batch(base / f"data_batch_{i}", imgs, lbls)
        all_imgs.append(imgs)
        all_lbls.append(lbls)
    test_imgs = (rs.rand(5, 3, 32, 32) * 255).astype(np.uint8)
    test_lbls = rs.randint(0, 10, size=5)
    _write_cifar_batch(base / "test_batch", test_imgs, test_lbls)

    ds = load_cifar10(str(tmp_path), train=True)
    assert ds.images.shape == (20, 32, 32, 3)
    assert ds.images.dtype == np.float32
    assert ds.labels.tolist() == np.concatenate(all_lbls).tolist()
    # CHW rows -> NHWC with exact /255 scaling, order preserved
    want = (
        np.concatenate(all_imgs).transpose(0, 2, 3, 1).astype(np.float32)
        / 255.0
    )
    np.testing.assert_allclose(ds.images, want, rtol=0)

    dt = load_cifar10(str(tmp_path), train=False)
    assert dt.images.shape == (5, 32, 32, 3)
    assert dt.labels.tolist() == test_lbls.tolist()
    np.testing.assert_allclose(
        dt.images,
        test_imgs.transpose(0, 2, 3, 1).astype(np.float32) / 255.0,
        rtol=0,
    )


def test_load_cifar10_flat_dir(tmp_path):
    """Batches directly under data_root (no cifar-10-batches-py subdir)."""
    imgs = (np.arange(2 * 3072, dtype=np.uint8).reshape(2, 3, 32, 32)) % 253
    for i in range(1, 6):
        _write_cifar_batch(tmp_path / f"data_batch_{i}", imgs, [i % 10, 9])
    ds = load_cifar10(str(tmp_path), train=True)
    assert ds.images.shape == (10, 32, 32, 3)
    assert ds.labels[1] == 9


def test_load_cifar10_missing_batch(tmp_path):
    base = tmp_path / "cifar-10-batches-py"
    base.mkdir()
    _write_cifar_batch(
        base / "data_batch_1", np.zeros((1, 3, 32, 32), np.uint8), [0]
    )
    with pytest.raises(FileNotFoundError):
        load_cifar10(str(tmp_path), train=True)  # batches 2..5 absent
