"""LR schedules with reference parity.

* ``learning_rate_with_decay`` — the MNIST boundary-decay schedule
  (odenet_mnist/utils.py:7-18): lr0 * batch_size/128, stepped down by
  ``decay_rates`` at ``boundary_epochs``.
* ``cyclic_lr`` — torch.optim.lr_scheduler.CyclicLR parity
  ('triangular'/'triangular2'), the backbone of the flagship 36-epoch CIFAR
  run (train_and_attack.py:104-108,503-508: base 1e-7, max 0.1,
  step_size_up 3186, triangular2).

Both return optax-style ``schedule(step) -> lr`` callables usable with
``optax.scale_by_learning_rate`` / ``optax.inject_hyperparams``.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

__all__ = [
    "learning_rate_with_decay",
    "cyclic_lr",
    "cyclic_momentum",
    "constant_lr",
]


def constant_lr(lr: float):
    return lambda step: jnp.asarray(lr, jnp.float32)


def learning_rate_with_decay(
    lr0: float,
    batch_size: int,
    batches_per_epoch: int,
    batch_denom: int = 128,
    boundary_epochs: Sequence[int] = (60, 100, 140),
    decay_rates: Sequence[float] = (1.0, 0.1, 0.01, 0.001),
):
    """Piecewise-constant decay on the *iteration* axis
    (odenet_mnist/utils.py:7-18)."""
    if len(decay_rates) != len(boundary_epochs) + 1:
        # an out-of-range index would be silently clamped by JAX gather
        # semantics, running at the wrong LR with no error
        raise ValueError(
            f"need len(boundary_epochs)+1 = {len(boundary_epochs) + 1} "
            f"decay_rates, got {len(decay_rates)}"
        )
    initial = lr0 * batch_size / batch_denom
    boundaries = jnp.asarray(
        [batches_per_epoch * e for e in boundary_epochs], jnp.int32
    )
    vals = jnp.asarray([initial * d for d in decay_rates], jnp.float32)

    def schedule(step):
        idx = jnp.sum(jnp.asarray(step, jnp.int32) >= boundaries)
        return vals[idx]

    return schedule


def _cyclic_amplitude(step_size_up: int, mode: str):
    """The shared CyclicLR triangle: amplitude(step) in [0, 1].

    cycle = floor(1 + step / (2 * s)),  x = |step/s - 2*cycle + 1|
    amplitude = max(0, 1-x) * scale(cycle)
    scale = 1 (triangular) or 1 / 2^(cycle-1) (triangular2).

    ``cyclic_lr`` and ``cyclic_momentum`` MUST stay phase-locked (momentum
    cycles exactly inversely to the lr, as torch's cycle_momentum does),
    so both are built from this one triangle.
    """
    if mode not in ("triangular", "triangular2"):
        raise ValueError(f"unsupported CyclicLR mode {mode!r}")
    s = float(step_size_up)

    def amplitude(step):
        step = jnp.asarray(step, jnp.float32)
        cycle = jnp.floor(1.0 + step / (2.0 * s))
        x = jnp.abs(step / s - 2.0 * cycle + 1.0)
        scale = (
            1.0 if mode == "triangular" else 1.0 / (2.0 ** (cycle - 1.0))
        )
        return jnp.maximum(0.0, 1.0 - x) * scale

    return amplitude


def cyclic_lr(
    base_lr: float,
    max_lr: float,
    step_size_up: int,
    mode: str = "triangular2",
):
    """torch CyclicLR (default step_size_down == step_size_up):
    lr = base + (max-base) * amplitude(step), see :func:`_cyclic_amplitude`.
    """
    amp = _cyclic_amplitude(step_size_up, mode)
    return lambda step: base_lr + (max_lr - base_lr) * amp(step)


def cyclic_momentum(
    step_size_up: int,
    mode: str = "triangular2",
    base_momentum: float = 0.8,
    max_momentum: float = 0.9,
):
    """torch CyclicLR's ``cycle_momentum=True`` companion schedule.

    The reference's flagship CIFAR recipe builds CyclicLR with
    ``cycle_momentum=(optim != "adam")`` (train_and_attack.py:503-508), so
    every published SGD run cycles momentum *inversely* to the lr between
    torch's defaults base_momentum=0.8 and max_momentum=0.9:

      momentum = max_m - (max_m - base_m) * amplitude(step)

    with the same triangle as :func:`cyclic_lr` (shared via
    :func:`_cyclic_amplitude`) — momentum is at max when lr is at base and
    vice versa.  Pass the result as ``momentum=`` to :func:`make_optimizer`
    (callable momenta are injected per step).
    """
    amp = _cyclic_amplitude(step_size_up, mode)
    return lambda step: (
        max_momentum - (max_momentum - base_momentum) * amp(step)
    )
