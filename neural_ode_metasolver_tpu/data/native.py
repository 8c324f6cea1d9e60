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
    """Compile to a temp path then atomically rename: concurrent processes
    (parallel pytest, two runners) can race on _LIB_PATH, and dlopen of a
    half-written .so would permanently disable the native path."""
    tmp = f"{_LIB_PATH}.{os.getpid()}.tmp"
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-Wall", "-fPIC", "-shared",
             "-pthread", "-o", tmp, _SRC],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(tmp, _LIB_PATH)
        return True
    except Exception:
        try:
            os.remove(tmp)
        except OSError:
            pass
        return False


def _stale() -> bool:
    """The .so must be rebuilt when the source is newer — an existing
    binary would otherwise silently pin pre-fix behavior forever. (The
    binary is never committed: it embeds -march=native host ISA.)"""
    try:
        return os.path.getmtime(_SRC) > os.path.getmtime(_LIB_PATH)
    except OSError:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB_PATH) or _stale():
            if not os.path.exists(_SRC) or not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            abi = lib.nodems_abi_version()
        except (OSError, AttributeError):
            # unreadable lib, or a foreign/ancient .so without the ABI
            # symbol: fall back to NumPy rather than raising
            _build_failed = True
            return None
        if abi != 1:
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
    if (mean is None) != (std is None):
        raise ValueError("mean and std must be given together")
    images = np.ascontiguousarray(images, np.float32)
    idx = np.ascontiguousarray(indices, np.int64)
    n, h, w, c = images.shape
    if idx.size and (idx.min() < 0 or idx.max() >= n):
        # the C++ kernel does raw pointer arithmetic; match the NumPy
        # path's IndexError instead of reading out of bounds
        raise IndexError(
            f"indices out of range [0, {n}): "
            f"[{int(idx.min())}, {int(idx.max())}]"
        )
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
        # full 32-bit seed space (RandomState's limit); the old 31-bit
        # mask collapsed distinct seeds to identical permutations
        rs = np.random.RandomState(seed % (2 ** 32))
        idx[:] = rs.permutation(n)
        return idx
    lib.nodems_shuffle_indices(
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
        ctypes.c_uint64(seed),
    )
    return idx
