"""Checkpoint / resume via orbax.

Supersedes the reference's three torch.save formats (SURVEY.md §5): one
orbax checkpoint holds the full TrainState pytree (params, model state,
optimizer state, step) plus a JSON config sidecar with the solver spec, so
evaluation can reconstruct solvers exactly as ``attacks_runner.py:65`` does
from saved ``args``.  Unlike the reference (save-only), restore is wired.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

from .train import TrainState

__all__ = [
    "save_checkpoint",
    "restore_checkpoint",
    "load_checkpoint_config",
    "latest_step",
    "wait_for_checkpoints",
]


def _ckpt_dir(base: str, step: int) -> str:
    return os.path.join(os.path.abspath(base), f"step_{step:08d}")


# One AsyncCheckpointer per destination directory: orbax serializes saves
# on a single checkpointer (save() begins by waiting for the previous one),
# so several saves in one epoch (best_solver_*, best_<mode>, last) would
# otherwise block each other on the main thread instead of overlapping the
# next epoch's compute. The set of destinations per run is small and fixed.
_async_ckptrs: dict = {}


def _get_async_ckptr(base_dir: str):
    key = os.path.abspath(base_dir)
    if key not in _async_ckptrs:
        _async_ckptrs[key] = ocp.AsyncCheckpointer(
            ocp.StandardCheckpointHandler()
        )
    return _async_ckptrs[key]


def save_checkpoint(
    base_dir: str,
    ts: TrainState,
    config: Optional[Dict[str, Any]] = None,
    block: bool = True,
):
    """Write one orbax checkpoint (+ config sidecar) for ``ts``'s step.

    ``block=False`` uses an async checkpointer: the device->host snapshot
    happens before this returns (so donating/overwriting ``ts`` afterwards
    is safe), but serialization and disk IO proceed on a background thread
    — the per-epoch save no longer stalls the train loop. Call
    ``wait_for_checkpoints()`` before reading the files (done at the end
    of ``runners.common.fit``)."""
    step = int(ts.step)
    path = _ckpt_dir(base_dir, step)
    if jax.process_count() > 1:
        # multi-host: every process calls save (orbax's primary host
        # writes, the rest participate in its barriers) — and saves must
        # be synchronous: async commit threads fire their cross-process
        # barriers in nondeterministic order, colliding with the next
        # save's ("Barrier ... is already ongoing")
        block = True
    if block:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.join(path, "state"), ts, force=True)
        ckptr.wait_until_finished()
    else:
        _get_async_ckptr(base_dir).save(
            os.path.join(path, "state"),
            args=ocp.args.StandardSave(ts),
            force=True,
        )
    if config is not None and jax.process_index() == 0:
        # one sidecar writer under multi-host (every process calls save —
        # orbax's primary host writes the state, the rest only barrier)
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "config.json"), "w") as f:
            json.dump(config, f, indent=2, default=str)
    return path


def wait_for_checkpoints():
    """Block until every ``save_checkpoint(..., block=False)`` has
    committed to disk."""
    for ckptr in _async_ckptrs.values():
        ckptr.wait_until_finished()


def latest_step(base_dir: str) -> Optional[int]:
    """Newest *committed* step: a step dir only counts once its orbax
    ``state`` dir exists (orbax commits it by atomic rename, so presence
    means complete). A crash between an async state write and its commit
    can leave ``step_N/config.json`` without ``state``; such a dir must
    not shadow the older complete checkpoint for ``--resume``."""
    if not os.path.isdir(base_dir):
        return None
    steps = []
    for name in os.listdir(base_dir):
        if name.startswith("step_") and os.path.isdir(
            os.path.join(base_dir, name, "state")
        ):
            try:
                steps.append(int(name[5:]))
            except ValueError:
                pass
    return max(steps) if steps else None


def load_checkpoint_config(base_dir: str, step: Optional[int] = None):
    """Read a checkpoint's ``config.json`` sidecar WITHOUT restoring state.

    Restore paths need the saved config first — the optimizer flags in it
    determine the opt-state pytree layout of the structure-matching
    template (``runners.common.optimizer_from_saved_args``) that
    :func:`restore_checkpoint` requires.  Returns None if the checkpoint
    has no sidecar."""
    if step is None:
        step = latest_step(base_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {base_dir}")
    cfg_path = os.path.join(_ckpt_dir(base_dir, step), "config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            return json.load(f)
    return None


def restore_checkpoint(
    base_dir: str, target: TrainState, step: Optional[int] = None
):
    """Restore a TrainState (``target`` provides the pytree structure /
    shapes, e.g. a freshly created state).  Returns (state, config|None)."""
    if step is None:
        step = latest_step(base_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {base_dir}")
    path = _ckpt_dir(base_dir, step)
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.join(path, "state"), target)
    cfg_path = os.path.join(path, "config.json")
    config = None
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            config = json.load(f)
    return restored, config
