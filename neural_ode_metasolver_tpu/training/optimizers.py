"""Optimizers with torch-parity semantics via optax.

Covers the reference's optimizer menu (train_and_attack.py:480-500 /
runner.py:141): sgd(momentum) / rmsprop / adam, with

  * coupled L2 weight decay applied to the *gradient* before the optimizer
    update (torch semantics for all three), via ``optax.add_decayed_weights``
    first in the chain;
  * torch RMSprop's eps-outside-sqrt (``eps_in_sqrt=False``, alpha=0.99);
  * optional global-norm gradient clipping (train_and_attack.py:313-314);
  * ``zero_grad_every`` gradient accumulation via ``optax.MultiSteps``
    (train_and_attack.py:100,258,316).
"""
from __future__ import annotations

from typing import Callable, Optional, Union

import optax

__all__ = ["make_optimizer"]

Schedule = Union[float, Callable]


def make_optimizer(
    name: str,
    learning_rate: Schedule,
    momentum: float = 0.9,
    weight_decay: float = 0.0,
    grad_clip: Optional[float] = None,
    every_k: int = 1,
) -> optax.GradientTransformation:
    parts = []
    if grad_clip is not None:
        parts.append(optax.clip_by_global_norm(grad_clip))
    if weight_decay:
        # torch couples wd into the gradient before the update rule
        parts.append(optax.add_decayed_weights(weight_decay))

    name = name.lower()
    if name == "sgd":
        parts.append(optax.trace(decay=momentum, nesterov=False))
    elif name == "rmsprop":
        # torch RMSprop defaults: alpha=0.99, eps=1e-8 added outside the sqrt
        parts.append(
            optax.scale_by_rms(decay=0.99, eps=1e-8, eps_in_sqrt=False)
        )
    elif name == "adam":
        parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    else:
        raise ValueError(f"unknown optimizer {name!r}")

    parts.append(optax.scale_by_learning_rate(learning_rate))
    tx = optax.chain(*parts)
    if every_k > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=every_k)
    return tx
