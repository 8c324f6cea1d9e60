"""ctypes binding to the native (C++) input-pipeline kernels.

``native/nodems_data.cc`` implements the per-batch hot loop (index gather +
RandomCrop(pad) + RandomHorizontalFlip + Normalize) as a multithreaded C++
kernel.  This module builds it on demand (g++, no external deps), loads it via
ctypes, and exposes a drop-in augmented-batch function.  When the toolchain
or library is unavailable everything falls back to the NumPy implementation
in datasets.py — behavior is identical up to RNG streams (documented: the
native path uses per-sample SplitMix64 keyed by (seed, position), so results
are deterministic and thread-count independent, but not bit-equal to the
NumPy path).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

__all__ = ["native_available", "augment_batch_native", "shuffle_indices"]

_REPO_ROOT = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")
)
_SRC = os.path.join(_REPO_ROOT, "native", "nodems_data.cc")
_LIB_PATH = os.path.join(_REPO_ROOT, "native", "libnodems_data.so")

_lib = None
_lock = threading.Lock()
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-pthread",
             "-o", _LIB_PATH, _SRC],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB_PATH):
            if not os.path.exists(_SRC) or not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        if lib.nodems_abi_version() != 1:
            _build_failed = True
            return None
        lib.nodems_augment_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_uint64, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        lib.nodems_shuffle_indices.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_uint64
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def augment_batch_native(
    images: np.ndarray,
    indices: np.ndarray,
    *,
    crop_padding: int = 0,
    hflip: bool = False,
    mean=None,
    std=None,
    seed: int = 0,
    num_threads: int = 0,
) -> np.ndarray:
    """Gather ``images[indices]`` with augmentation+normalization, natively."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native pipeline unavailable (g++ build failed)")
    images = np.ascontiguousarray(images, np.float32)
    idx = np.ascontiguousarray(indices, np.int64)
    n, h, w, c = images.shape
    out = np.empty((idx.shape[0], h, w, c), np.float32)
    if mean is not None:
        mean_a = np.ascontiguousarray(mean, np.float32)
        std_a = np.ascontiguousarray(std, np.float32)
        mean_p, std_p = _fptr(mean_a), _fptr(std_a)
    else:
        mean_p = ctypes.cast(None, ctypes.POINTER(ctypes.c_float))
        std_p = mean_p
    if num_threads <= 0:
        num_threads = min(8, os.cpu_count() or 1)
    lib.nodems_augment_batch(
        _fptr(images), n, h, w, c,
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), idx.shape[0],
        crop_padding, int(hflip), mean_p, std_p,
        ctypes.c_uint64(seed), _fptr(out), num_threads,
    )
    return out


def shuffle_indices(n: int, seed: int) -> np.ndarray:
    lib = _load()
    idx = np.empty((n,), np.int64)
    if lib is None:
        rs = np.random.RandomState(seed & 0x7FFFFFFF)
        idx[:] = rs.permutation(n)
        return idx
    lib.nodems_shuffle_indices(
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
        ctypes.c_uint64(seed),
    )
    return idx
