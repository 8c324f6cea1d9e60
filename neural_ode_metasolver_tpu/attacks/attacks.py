"""Adversarial attacks as pure functions of a forward closure.

Re-design of ``MegaAdversarial/src/attacks`` (attack.py, base.py, fgsm.py,
pgd.py): an attack is a pure function taking ``forward: x_normalized ->
logits`` (already closed over params, solvers, regime key) and returning the
attacked, re-normalized input.  Input gradients come from ``jax.grad`` w.r.t.
the image; composed inside a jitted train step this yields the reference's
nested-differentiation pattern (input-grad inside the attack, then param-grad
through another full ODE solve — SURVEY.md §3.2).

Conventions (matching the reference):
  * All attacks assume the model consumes *normalized* inputs and internally
    round-trip to [0,1] pixel space via per-channel mean/std
    (fgsm.py:27-29, pgd.py:28-30).
  * FGSMRandom works directly in normalized space with per-channel eps/alpha
    scaled by the dataset std (fgsm.py:73-81) — the "fast adversarial
    training" method of Wong et al. used by the flagship CIFAR experiment.
  * PGD: optional uniform random start in the eps-ball, n_iter grad-sign steps
    with eps-box clamp + [0,1] projection (pgd.py:32-53), as lax.fori_loop.
  * FGSM2Ensemble: NLL of the log of softmax-prob average across (model,
    solver) pairs (fgsm.py:121-155).
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array
Forward = Callable[[Array], Array]

__all__ = [
    "cross_entropy",
    "clean",
    "clean2ensemble",
    "fgsm",
    "fgsm_random",
    "pgd",
    "fgsm2ensemble",
    "fgsm_mean_prob_attack",
    "normalize",
    "inv_normalize",
]


def cross_entropy(logits: Array, y: Array) -> Array:
    """Mean CE over the batch (torch nn.CrossEntropyLoss default)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=-1))


def _mean_std(mean, std, x):
    c = x.shape[-1]
    if mean is None:
        mean = (0.0,) * c
    if std is None:
        std = (1.0,) * c
    m = jnp.asarray(mean, x.dtype).reshape(1, 1, 1, -1)
    s = jnp.asarray(std, x.dtype).reshape(1, 1, 1, -1)
    return m, s


def normalize(x01: Array, mean=None, std=None) -> Array:
    m, s = _mean_std(mean, std, x01)
    return (x01 - m) / s


def inv_normalize(x: Array, mean=None, std=None) -> Array:
    m, s = _mean_std(mean, std, x)
    return x * s + m


def clean(x: Array, y: Array) -> Tuple[Array, Array]:
    """No-op attack (base.py:4-6) for uniform code paths."""
    return x, y


def clean2ensemble(x: Array, y: Array) -> Tuple[Array, Array]:
    """No-op ensemble attack (base.py:8-10)."""
    return x, y


def fgsm(
    forward: Forward,
    x: Array,
    y: Array,
    eps: float,
    mean=None,
    std=None,
) -> Tuple[Array, Array]:
    """Single-step FGSM in pixel space (fgsm.py:21-43)."""
    x01 = inv_normalize(x, mean, std)

    def loss_fn(x01):
        return cross_entropy(forward(normalize(x01, mean, std)), y)

    grad = jax.grad(loss_fn)(x01)
    x_adv = jnp.clip(x01 + eps * jnp.sign(grad), 0.0, 1.0)
    # detach (fgsm.py:40): composing the attack inside a differentiated
    # loss must not build double-backward through the inner input-grad
    return lax.stop_gradient(normalize(x_adv, mean, std)), y


def fgsm_random(
    forward: Forward,
    key: Array,
    x: Array,
    y: Array,
    epsilon: float,
    alpha: float,
    mean=None,
    std=None,
) -> Tuple[Array, Array]:
    """FGSM with random init, in normalized space (fgsm.py:54-106).

    With dataset mean/std given, eps/alpha and the valid box are per-channel
    scaled (:73-81); otherwise the box is [0, 1].
    """
    if mean is not None and std is not None:
        m, s = _mean_std(mean, std, x)
        lower = (0.0 - m) / s
        upper = (1.0 - m) / s
        eps_c = epsilon / s
        alpha_c = alpha / s
    else:
        lower, upper = 0.0, 1.0
        eps_c = jnp.asarray(epsilon, x.dtype)
        alpha_c = jnp.asarray(alpha, x.dtype)

    # delta = eps - 2 eps U[0,1)  == Uniform(-eps, eps]  (fgsm.py:93)
    u = jax.random.uniform(key, x.shape, x.dtype)
    delta = eps_c - (2.0 * eps_c) * u
    delta = jnp.clip(delta, lower - x, upper - x)

    def loss_fn(delta):
        return cross_entropy(forward(x + delta), y)

    grad = jax.grad(loss_fn)(delta)
    delta = jnp.clip(delta + alpha_c * jnp.sign(grad), -eps_c, eps_c)
    delta = jnp.clip(delta, lower - x, upper - x)
    return x + lax.stop_gradient(delta), y


def pgd(
    forward: Forward,
    key: Optional[Array],
    x: Array,
    y: Array,
    eps: float,
    lr: float,
    n_iter: int,
    randomized_start: bool = True,
    mean=None,
    std=None,
    fwd_key: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Projected gradient descent (pgd.py:23-57) with a fori_loop inner loop.

    ``fwd_key``: when given, ``forward`` is called as ``forward(x, k_i)``
    with ``k_i = fold_in(fwd_key, i)`` so every PGD iteration draws its
    OWN regime choice (switch solver id / ensemble coin) — the reference
    resamples via np.random on every model forward (mnist layers.py:27,33),
    whereas a key-less closure pins one draw for all ``n_iter`` forwards.
    Regimes that ignore the key (standalone) are numerically unaffected."""
    x01 = inv_normalize(x, mean, std)

    if randomized_start:
        if key is None:
            raise ValueError("pgd with randomized_start needs a PRNG key")
        init = jnp.clip(
            x01 + jax.random.uniform(key, x.shape, x.dtype, -eps, eps),
            0.0,
            1.0,
        )
    else:
        init = x01

    if fwd_key is None:
        def call(xa, i):
            return forward(normalize(xa, mean, std))
    else:
        def call(xa, i):
            return forward(normalize(xa, mean, std),
                           jax.random.fold_in(fwd_key, i))

    def body(i, xa):
        grad = jax.grad(lambda z: cross_entropy(call(z, i), y))(xa)
        xa = jnp.clip(xa + lr * jnp.sign(grad), x01 - eps, x01 + eps)
        return jnp.clip(xa, 0.0, 1.0)

    x_adv = lax.fori_loop(0, n_iter, body, init)
    return normalize(lax.stop_gradient(x_adv), mean, std), y


def fgsm_mean_prob_attack(
    mean_probs_fn: Callable[[Array], Array],
    x: Array,
    y: Array,
    eps: float,
    mean=None,
    std=None,
) -> Tuple[Array, Array]:
    """Shared core of FGSM2Ensemble (fgsm.py:121-155): one grad-sign step on
    the log-mean-prob NLL in pixel space.

    ``mean_probs_fn(xn)`` returns the prob-averaged ensemble softmax at
    normalized inputs — a Python loop over member forwards or a vmapped
    mesh-sharded batch; both eval paths route through this one function so
    the reference-parity attack semantics cannot drift between them.
    """
    x01 = inv_normalize(x, mean, std)

    def loss_fn(x01):
        logp = jnp.log(mean_probs_fn(normalize(x01, mean, std)))
        return -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=-1))

    grad = jax.grad(loss_fn)(x01)
    x_adv = jnp.clip(x01 + eps * jnp.sign(grad), 0.0, 1.0)
    # detach (fgsm.py:40): composing the attack inside a differentiated
    # loss must not build double-backward through the inner input-grad
    return lax.stop_gradient(normalize(x_adv, mean, std)), y


def fgsm2ensemble(
    forwards: Sequence[Forward],
    x: Array,
    y: Array,
    eps: float,
    mean=None,
    std=None,
) -> Tuple[Array, Array]:
    """FGSM against a softmax-prob-averaged model ensemble (fgsm.py:109-155).

    Each entry of ``forwards`` is a closure over its own (model, solver)
    configuration — the analog of the reference's per-model kwargs.
    """

    def mean_probs(xn):
        probs = None
        for fwd in forwards:
            p = jax.nn.softmax(fwd(xn), axis=-1)
            probs = p if probs is None else probs + p
        return probs / len(forwards)

    return fgsm_mean_prob_attack(mean_probs, x, y, eps, mean, std)
