"""Shared helpers (reference: sopa/src/models/utils.py,
odenet_mnist/utils.py).

``fix_seeds`` pins numpy/python RNGs and returns a root JAX key — JAX's
explicit-key model replaces torch's global ``manual_seed`` +
``cudnn.deterministic`` (models/utils.py:7-14); XLA:TPU is deterministic for
a fixed key by construction.
"""
from __future__ import annotations

import contextlib
import logging
import os
import random

import jax
import numpy as np

__all__ = ["fix_seeds", "count_parameters", "makedirs", "get_logger",
           "atomic_write"]


@contextlib.contextmanager
def atomic_write(path: str, mode: str = "w", **open_kwargs):
    """Open a same-directory temp file for writing and ``os.replace``
    it onto ``path`` on clean exit.

    An interrupt (timeout SIGTERM, OOM kill) mid-write can therefore
    never leave a truncated file at ``path`` — campaign drivers treat an
    existing output file as a completed chunk, so a torn write would be
    silently skipped as done on the re-run.  On an exception the temp
    file is removed and ``path`` is untouched.

    The temp name carries the pid so two writers to the same path (e.g.
    a parent retry racing a kill()ed-but-not-dead child) cannot replace
    each other's partial content; a SIGKILL (no Python cleanup) leaves
    at worst an orphaned ``.<pid>.tmp``, which is gitignored.
    """
    tmp = f"{path}.{os.getpid()}.tmp"
    try:
        with open(tmp, mode, **open_kwargs) as f:
            yield f
    except BaseException:
        with contextlib.suppress(OSError):
            os.remove(tmp)
        raise
    os.replace(tmp, path)


def fix_seeds(seed: int = 502) -> jax.Array:
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.key(seed)


def count_parameters(params) -> int:
    """Total trainable parameter count (odenet_mnist/utils.py:21-23)."""
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def makedirs(dirname: str):
    os.makedirs(dirname, exist_ok=True)


def get_logger(
    logpath: str,
    displaying: bool = True,
    saving: bool = True,
    debug: bool = False,
    name: str = "nodems",
) -> logging.Logger:
    """File+console logger (odenet_mnist/utils.py:30-55)."""
    logger = logging.getLogger(name)
    level = logging.DEBUG if debug else logging.INFO
    logger.setLevel(level)
    for h in logger.handlers:  # close old FileHandlers: no fd leak when a
        h.close()              # sweep re-invokes a runner in-process
    logger.handlers.clear()
    if saving:
        makedirs(os.path.dirname(os.path.abspath(logpath)))
        fh = logging.FileHandler(logpath)
        fh.setLevel(level)
        logger.addHandler(fh)
    if displaying:
        ch = logging.StreamHandler()
        ch.setLevel(level)
        logger.addHandler(ch)
    return logger
