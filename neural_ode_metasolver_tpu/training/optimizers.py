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

from typing import Any, Callable, NamedTuple, Optional, Union

import optax

__all__ = ["make_optimizer", "with_nonfinite_backoff", "NonfiniteBackoffState"]

Schedule = Union[float, Callable]


def make_optimizer(
    name: str,
    learning_rate: Schedule,
    momentum: Schedule = 0.9,
    weight_decay: float = 0.0,
    grad_clip: Optional[float] = None,
    every_k: int = 1,
    nonfinite_backoff: Optional[float] = None,
) -> optax.GradientTransformation:
    """``nonfinite_backoff`` (e.g. 0.5) wraps the whole chain in
    :func:`with_nonfinite_backoff`: non-finite grads are dropped and the
    effective step size dips by that factor, then recovers."""
    parts = []
    if grad_clip is not None:
        parts.append(optax.clip_by_global_norm(grad_clip))
    if weight_decay:
        # torch couples wd into the gradient before the update rule
        parts.append(optax.add_decayed_weights(weight_decay))

    def momentum_part():
        # per-step momentum (torch CyclicLR cycle_momentum=True,
        # train_and_attack.py:503-508): inject_hyperparams evaluates
        # the schedule at the pre-increment count, matching torch's
        # "iteration t uses scheduler value t" ordering
        if callable(momentum):
            if every_k > 1:
                # the momentum trace sits INSIDE MultiSteps, whose inner
                # count advances once per emitted update, while torch's
                # scheduler writes momentum into the param group every
                # iteration (train_and_attack.py:564).  Emit #m happens at
                # iteration m*k + k - 1, so remap the inner count to keep
                # the momentum phase locked to the per-iteration LR.
                mom_sched = lambda c: momentum((c + 1) * every_k - 1)
            else:
                mom_sched = momentum
            return optax.inject_hyperparams(optax.trace)(
                decay=mom_sched, nesterov=False
            )
        return optax.trace(decay=momentum, nesterov=False)

    name = name.lower()
    if name == "sgd":
        parts.append(momentum_part())
    elif name == "rmsprop":
        # torch RMSprop defaults: alpha=0.99, eps=1e-8 added outside the sqrt
        parts.append(
            optax.scale_by_rms(decay=0.99, eps=1e-8, eps_in_sqrt=False)
        )
        if callable(momentum):
            # torch RMSprop has a momentum buffer (buf = m*buf + u;
            # p -= lr*buf) that the reference only ever exercises through
            # CyclicLR's cycle_momentum writing 0.8-0.9 into the param
            # group — so a CALLABLE momentum gets the trace; the float
            # default stays ignored (reference constructs RMSprop without
            # momentum, runner.py:141 / train_and_attack.py:487-492)
            parts.append(momentum_part())
    elif name == "adam":
        parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    else:
        raise ValueError(f"unknown optimizer {name!r}")

    lr_part = optax.scale_by_learning_rate(learning_rate)
    if every_k > 1:
        # the LR schedule stays OUTSIDE the accumulation wrapper: its count
        # then advances every iteration, matching the reference's
        # per-iteration scheduler.step() regardless of zero_grad_every
        # (train_and_attack.py:316,564) — inside MultiSteps it would tick
        # once per k and run the cyclic schedule k-times slower.
        # Non-emit iterations scale MultiSteps' zero updates (a no-op).
        tx = optax.chain(
            optax.MultiSteps(optax.chain(*parts), every_k_schedule=every_k),
            lr_part,
        )
    else:
        tx = optax.chain(*parts, lr_part)
    if nonfinite_backoff is not None:
        tx = with_nonfinite_backoff(tx, backoff=nonfinite_backoff)
    return tx


class NonfiniteBackoffState(NamedTuple):
    inner: Any
    scale: Any        # f32 scalar in (0, 1]
    n_skipped: Any    # i32 total non-finite updates dropped


def with_nonfinite_backoff(
    tx: optax.GradientTransformation,
    backoff: float = 0.5,
    recovery: float = 1.1,
    min_scale: float = 1e-3,
) -> optax.GradientTransformation:
    """Containment WITH recovery for non-finite gradients.

    The round-2 36-epoch runs showed that batch-level skip
    (``skip_nonfinite``) contains a divergence but never recovers: once the
    loss blows up at high LR, every subsequent update is skipped and the
    run is stuck (results/RESULTS.md).  This wrapper adds the missing
    dynamics: a non-finite gradient is dropped (inner optimizer state
    untouched) AND the effective step size is multiplied by ``backoff``;
    every finite step multiplies it by ``recovery`` back toward 1.  The
    net effect is an automatic LR dip after instability, letting training
    resume instead of freezing.  (optax.apply_if_finite gives the skip but
    not the backoff.)

    Fully jit-compatible: all branching is ``jnp.where`` on a traced flag.
    """
    import jax
    import jax.numpy as jnp

    def init(params):
        return NonfiniteBackoffState(
            inner=tx.init(params),
            scale=jnp.ones((), jnp.float32),
            n_skipped=jnp.zeros((), jnp.int32),
        )

    def update(grads, state, params=None):
        finite = jnp.asarray(
            optax.global_norm(grads), jnp.float32
        )
        ok = jnp.isfinite(finite)
        safe = jax.tree_util.tree_map(
            lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads
        )
        upd, new_inner = tx.update(safe, state.inner, params)
        # a skipped step must leave the inner state (momentum, nu, counts)
        # exactly as it was
        new_inner = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old)
            if hasattr(new, "dtype") else new,
            new_inner, state.inner,
        )
        upd = jax.tree_util.tree_map(
            lambda u: jnp.where(ok, u * state.scale, jnp.zeros_like(u)), upd
        )
        new_scale = jnp.where(
            ok,
            jnp.minimum(state.scale * recovery, 1.0),
            jnp.maximum(state.scale * backoff, min_scale),
        ).astype(jnp.float32)
        return upd, NonfiniteBackoffState(
            inner=new_inner,
            scale=new_scale,
            n_skipped=state.n_skipped + jnp.where(ok, 0, 1).astype(jnp.int32),
        )

    return optax.GradientTransformation(init, update)
