"""Native (C++) input-pipeline tests: build via g++, property-check the
augmentation kernel against the NumPy reference semantics, determinism, and
throughput sanity."""
import os

import numpy as np
import pytest

from neural_ode_metasolver_tpu.data import Dataset, batch_iterator, synthetic_dataset
from neural_ode_metasolver_tpu.data.native import (
    augment_batch_native,
    native_available,
    shuffle_indices,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native pipeline not buildable"
)


def test_gather_no_augmentation():
    imgs = np.random.RandomState(0).rand(10, 8, 8, 3).astype(np.float32)
    idx = np.asarray([3, 1, 7], np.int64)
    out = augment_batch_native(imgs, idx)
    np.testing.assert_array_equal(out, imgs[idx])


def test_normalize():
    imgs = np.random.RandomState(0).rand(4, 8, 8, 3).astype(np.float32)
    idx = np.arange(4, dtype=np.int64)
    mean = (0.5, 0.4, 0.3)
    std = (0.2, 0.25, 0.3)
    out = augment_batch_native(imgs, idx, mean=mean, std=std)
    expected = (imgs - np.asarray(mean)) / np.asarray(std)
    np.testing.assert_allclose(out, expected.astype(np.float32), atol=1e-6)


def test_crop_stays_within_padded_support():
    """Every output pixel must come from the zero-padded source image, and
    over many seeds non-zero offsets must occur."""
    imgs = (np.random.RandomState(0).rand(2, 8, 8, 1) + 0.5).astype(np.float32)
    idx = np.zeros((2,), np.int64)
    saw_shift = False
    for seed in range(20):
        out = augment_batch_native(imgs, idx, crop_padding=2, seed=seed)
        assert out.shape == (2, 8, 8, 1)
        # zero rows/cols appear iff offset != center
        if not np.allclose(out[0], imgs[0]):
            saw_shift = True
        # all non-zero values must exist in the original image
        nz = out[out > 0]
        assert np.isin(nz, imgs).all()
    assert saw_shift


def test_hflip_statistics_and_exactness():
    imgs = np.random.RandomState(0).rand(1, 6, 6, 2).astype(np.float32)
    idx = np.zeros((1,), np.int64)
    flipped = 0
    for seed in range(40):
        out = augment_batch_native(imgs, idx, hflip=True, seed=seed)
        if np.allclose(out[0], imgs[0, :, ::-1]):
            flipped += 1
        else:
            np.testing.assert_allclose(out[0], imgs[0])
    assert 8 < flipped < 32  # ~Binomial(40, 0.5)


def test_deterministic_and_thread_invariant():
    imgs = np.random.RandomState(1).rand(64, 16, 16, 3).astype(np.float32)
    idx = np.arange(64, dtype=np.int64)
    a = augment_batch_native(imgs, idx, crop_padding=4, hflip=True, seed=7,
                             num_threads=1)
    b = augment_batch_native(imgs, idx, crop_padding=4, hflip=True, seed=7,
                             num_threads=8)
    np.testing.assert_array_equal(a, b)
    c = augment_batch_native(imgs, idx, crop_padding=4, hflip=True, seed=8)
    assert not np.array_equal(a, c)


def test_shuffle_indices():
    idx = shuffle_indices(100, seed=3)
    assert sorted(idx.tolist()) == list(range(100))
    idx2 = shuffle_indices(100, seed=3)
    np.testing.assert_array_equal(idx, idx2)
    assert not np.array_equal(idx, shuffle_indices(100, seed=4))


def test_batch_iterator_native_backend():
    ds = synthetic_dataset(64, (16, 16, 3), seed=0)
    batches = list(
        batch_iterator(ds, 16, crop_padding=4, hflip=True,
                       mean=(0.5, 0.5, 0.5), std=(0.25, 0.25, 0.25),
                       backend="native")
    )
    assert len(batches) == 4
    x, y = batches[0]
    assert x.shape == (16, 16, 16, 3) and x.dtype == np.float32
    # normalized range plausible
    assert np.abs(x).max() <= 1.0 / 0.25 + 1e-5


def test_native_faster_than_numpy():
    import time

    ds = synthetic_dataset(2048, (32, 32, 3), seed=0)

    def run(backend):
        t0 = time.perf_counter()
        for _ in batch_iterator(ds, 256, crop_padding=4, hflip=True,
                                mean=(0.5, 0.5, 0.5), std=(0.2, 0.2, 0.2),
                                backend=backend, seed=1):
            pass
        return time.perf_counter() - t0

    run("native")  # warm the library
    t_native = min(run("native") for _ in range(3))
    t_numpy = min(run("numpy") for _ in range(3))
    # the multithreaded native path should win comfortably; assert modestly
    assert t_native < t_numpy


def test_native_rejects_out_of_range_indices():
    from neural_ode_metasolver_tpu.data.native import (
        augment_batch_native,
        native_available,
    )

    if not native_available():
        pytest.skip("native pipeline unavailable")
    imgs = np.zeros((4, 8, 8, 3), np.float32)
    with pytest.raises(IndexError, match="out of range"):
        augment_batch_native(imgs, np.array([0, 4]))
    with pytest.raises(IndexError, match="out of range"):
        augment_batch_native(imgs, np.array([-1]))
    with pytest.raises(ValueError, match="together"):
        augment_batch_native(imgs, np.array([0]), mean=(0.5, 0.5, 0.5))


def test_shuffle_seed_fallback_uses_full_32_bits(monkeypatch):
    """Distinct seeds must give distinct permutations in the NumPy
    fallback (the old 31-bit mask collapsed 2**31 and 0... masked pairs)."""
    import neural_ode_metasolver_tpu.data.native as nat

    monkeypatch.setattr(nat, "_load", lambda: None)
    a = nat.shuffle_indices(1000, seed=2 ** 31)
    b = nat.shuffle_indices(1000, seed=2 ** 31 + 2 ** 31)  # 2**32 -> 0
    c = nat.shuffle_indices(1000, seed=0)
    assert not np.array_equal(a, c), "31-bit mask collapse"
    np.testing.assert_array_equal(b, c)  # 2**32 == 0 mod 2**32, by design


def test_stale_so_is_rebuilt(tmp_path):
    """Touching the source after the lib was built must trigger a rebuild
    (an old binary silently pins pre-fix behavior otherwise)."""
    import time

    import neural_ode_metasolver_tpu.data.native as nat

    if not nat.native_available():
        pytest.skip("native pipeline unavailable")
    old_mtime = os.path.getmtime(nat._LIB_PATH)
    time.sleep(0.05)
    os.utime(nat._SRC)  # source now newer
    # reset the module-level cache so _load re-evaluates
    nat._lib = None
    assert nat.native_available()
    assert os.path.getmtime(nat._LIB_PATH) > old_mtime, "no rebuild"
