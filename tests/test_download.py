"""data.download: checksum gate, file:// mirror fetch, skip-if-present,
offline error text, CIFAR archive extraction feeding load_cifar10."""
import gzip
import hashlib
import io
import os
import pickle
import struct
import tarfile

import numpy as np
import pytest

from neural_ode_metasolver_tpu.data import load_cifar10, load_mnist
from neural_ode_metasolver_tpu.data.download import (
    DATASETS,
    RemoteFile,
    _extract_cifar,
    _fetch,
    download_dataset,
    ensure_dataset,
    verify_md5,
)


def _md5(b: bytes) -> str:
    return hashlib.md5(b).hexdigest()


def test_verify_md5(tmp_path):
    p = tmp_path / "f.bin"
    p.write_bytes(b"hello")
    assert verify_md5(str(p), _md5(b"hello"))
    assert not verify_md5(str(p), _md5(b"other"))
    assert not verify_md5(str(tmp_path / "missing"), _md5(b"hello"))


def test_fetch_from_file_url_and_skip_if_present(tmp_path):
    src = tmp_path / "src.bin"
    src.write_bytes(b"payload")
    rf = RemoteFile((src.as_uri(),), _md5(b"payload"), "dest.bin")
    root = tmp_path / "root"
    dest = _fetch(rf, str(root), quiet=True)
    assert open(dest, "rb").read() == b"payload"
    # second call must short-circuit on the verified file: break the mirror
    src.unlink()
    assert _fetch(rf, str(root), quiet=True) == dest


def test_fetch_checksum_mismatch_and_offline_error(tmp_path):
    src = tmp_path / "src.bin"
    src.write_bytes(b"tampered")
    rf = RemoteFile((src.as_uri(),), _md5(b"expected"), "dest.bin")
    with pytest.raises(RuntimeError, match="checksum mismatch"):
        _fetch(rf, str(tmp_path / "root"), quiet=True)
    # no mirror reachable -> actionable provisioning message
    rf2 = RemoteFile(((tmp_path / "gone.bin").as_uri(),), _md5(b"x"), "d.bin")
    with pytest.raises(RuntimeError, match="Provision it manually"):
        _fetch(rf2, str(tmp_path / "root"), quiet=True)


def _tiny_cifar_archive(tmp_path):
    """cifar-10-python.tar.gz with 2-image batches in the real schema."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tf:
        for name in [f"data_batch_{i}" for i in range(1, 6)] + ["test_batch"]:
            data = pickle.dumps({
                b"data": np.arange(2 * 3072, dtype=np.uint8).reshape(2, 3072),
                b"labels": [3, 7],
            })
            info = tarfile.TarInfo(f"cifar-10-batches-py/{name}")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    raw = buf.getvalue()
    p = tmp_path / "cifar-10-python.tar.gz"
    p.write_bytes(raw)
    return p, _md5(raw)


def test_cifar_download_extract_read_roundtrip(tmp_path, monkeypatch):
    archive, md5 = _tiny_cifar_archive(tmp_path)
    monkeypatch.setitem(
        DATASETS, "cifar10",
        [RemoteFile((archive.as_uri(),), md5, "cifar-10-python.tar.gz")])
    root = tmp_path / "root"
    download_dataset("cifar10", str(root), quiet=True)
    ds = load_cifar10(str(root), train=True)
    assert len(ds) == 10 and ds.images.shape == (10, 32, 32, 3)
    assert list(ds.labels[:2]) == [3, 7]
    # idempotent re-run with the mirror gone (files verified/extracted)
    archive.unlink()
    download_dataset("cifar10", str(root), quiet=True)


def test_mnist_download_feeds_reader(tmp_path, monkeypatch):
    def idx_gz(dims, value):
        magic = struct.pack(">I", (0x08 << 8) | len(dims))
        body = magic + b"".join(struct.pack(">I", d) for d in dims)
        body += bytes([value]) * int(np.prod(dims))
        return gzip.compress(body)

    files = {
        "train-images-idx3-ubyte.gz": idx_gz((2, 28, 28), 7),
        "train-labels-idx1-ubyte.gz": idx_gz((2,), 1),
        "t10k-images-idx3-ubyte.gz": idx_gz((2, 28, 28), 9),
        "t10k-labels-idx1-ubyte.gz": idx_gz((2,), 4),
    }
    remotes = []
    for name, raw in files.items():
        p = tmp_path / ("mirror_" + name)
        p.write_bytes(raw)
        remotes.append(RemoteFile((p.as_uri(),), _md5(raw), name))
    monkeypatch.setitem(DATASETS, "mnist", remotes)
    root = tmp_path / "root"
    download_dataset("mnist", str(root), quiet=True)
    train = load_mnist(str(root), train=True)
    test = load_mnist(str(root), train=False)
    assert train.images.shape == (2, 28, 28, 1)
    assert list(test.labels) == [4, 4]


def test_unknown_dataset_and_ensure_fallback(tmp_path, monkeypatch):
    with pytest.raises(ValueError, match="unknown dataset"):
        download_dataset("imagenet", str(tmp_path))
    bad = RemoteFile(((tmp_path / "none").as_uri(),), "0" * 32, "x.bin")
    monkeypatch.setitem(DATASETS, "mnist", [bad])
    assert ensure_dataset("mnist", str(tmp_path / "r")) is None
    assert ensure_dataset("imagenet", str(tmp_path / "r")) is None


def test_extract_guards_path_traversal(tmp_path):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tf:
        data = b"evil"
        info = tarfile.TarInfo("../../cifar-10-batches-py/data_batch_1")
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))
    p = tmp_path / "evil.tar.gz"
    p.write_bytes(buf.getvalue())
    root = tmp_path / "root"
    # the traversal member is filtered out — nothing is written anywhere,
    # and the now-incomplete extraction is reported instead of passing
    # silently (advisor round-2 finding on the success message)
    with pytest.raises(RuntimeError, match="missing"):
        _extract_cifar(str(p), str(root), quiet=True)
    assert os.listdir(root / "cifar-10-batches-py") == []
    assert not (tmp_path.parent / "cifar-10-batches-py").exists()


def test_dataset_present_short_circuits_fetch(tmp_path, monkeypatch):
    from neural_ode_metasolver_tpu.data.download import dataset_present

    root = tmp_path / "root"
    base = root / "cifar-10-batches-py"
    base.mkdir(parents=True)
    for n in [f"data_batch_{i}" for i in range(1, 6)] + ["test_batch"]:
        (base / n).write_bytes(b"x")
    assert dataset_present("cifar10", str(root))
    # no mirrors registered at all: fetch would fail, so returning []
    # proves the reader-layout check short-circuited
    monkeypatch.setitem(DATASETS, "cifar10", [
        RemoteFile(((tmp_path / "gone").as_uri(),), "0" * 32, "x.tar.gz")])
    assert download_dataset("cifar10", str(root), quiet=True) == []
    # uncompressed MNIST IDX files (no .gz archives) count as present too
    for p in ("train", "t10k"):
        (root / f"{p}-images-idx3-ubyte").write_bytes(b"x")
        (root / f"{p}-labels-idx1-ubyte").write_bytes(b"x")
    assert dataset_present("mnist", str(root))
    assert not dataset_present("svhn", str(root))


def test_fetch_uses_socket_timeout(tmp_path, monkeypatch):
    """_fetch must pass an explicit timeout to urlopen so blackholed
    networks fail fast instead of hanging in connect."""
    import neural_ode_metasolver_tpu.data.download as dl

    seen = {}

    class _Resp:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def read(self, n):
            return b""

    def fake_urlopen(url, timeout=None):
        seen["timeout"] = timeout
        return _Resp()

    monkeypatch.setattr(dl.urllib.request, "urlopen", fake_urlopen)
    rf = RemoteFile(("http://example.invalid/f",), _md5(b""), "f.bin")
    _fetch(rf, str(tmp_path), quiet=True)
    assert seen["timeout"] is not None and seen["timeout"] > 0


def test_dataset_present_torchvision_mnist_layout(tmp_path):
    from neural_ode_metasolver_tpu.data.download import dataset_present

    root = tmp_path / "data"
    raw = root / "MNIST" / "raw"
    raw.mkdir(parents=True)
    for p in ("train", "t10k"):
        (raw / f"{p}-images-idx3-ubyte.gz").write_bytes(b"x")
        (raw / f"{p}-labels-idx1-ubyte.gz").write_bytes(b"x")
    assert dataset_present("mnist", str(root))
