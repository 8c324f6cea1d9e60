"""The jitted training step: smoothing-noise -> attack -> forward -> update.

One compiled function reproduces the reference's per-iteration recipe
(examples/cifar10/train_and_attack.py:246-323 / odenet_mnist/train_validate.py:19-115):

  1. [smoothing] perturb each solver's (u, v) around (u0, v0) — per batch
  2. build the adversarial batch (clean / fgsm / fgsm_random / at=PGD),
     attacking through the *current* (noised) solvers with the model in eval
     mode, exactly like the reference's ``model.eval()`` guard
  3. optional Gaussian data noise
  4. forward (train mode) + CE loss (+ ss-loss regularizer)
  5. optax update (wd / clipping / accumulation are inside the optimizer)

"Denoising" the solver params (reference :319-323) is implicit: the noised
solvers are local to the step; the canonical solver list keeps (u0, v0).

The whole step — including the attack's input-gradient, i.e. nested
differentiation through two full ODE solves — is traced once and compiled.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..attacks import (
    clean as clean_attack,
    cross_entropy,
    fgsm,
    fgsm_random,
    pgd,
)
from ..models.api import Model
from ..ops.noise import noise_solver
from ..ops.regimes import SolverOptions
from ..ops.solver import ParametricSolver

Array = jax.Array

__all__ = [
    "AttackConfig",
    "NoiseConfig",
    "LossConfig",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
]


@dataclass(frozen=True)
class AttackConfig:
    """Adversarial-training/eval attack settings
    (train_and_attack.py:130-158 flag set)."""

    mode: str = "clean"  # clean | fgsm | at (=PGD) | fgsm_random
    eps: float = 8 / 255
    alpha: float = 10 / 255  # fgsm_random step size
    pgd_lr: float = 2 / 255
    pgd_niter: int = 7
    pgd_random_start: bool = True
    mean: Optional[Tuple[float, ...]] = None
    std: Optional[Tuple[float, ...]] = None


@dataclass(frozen=True)
class NoiseConfig:
    """Solver smoothing (train_and_attack.py:74-79 flags)."""

    noise_type: Optional[str] = None  # None | 'cauchy' | 'normal'
    sigma: float = 0.001
    prob: float = 0.0
    minimize_rk2_error: bool = False


@dataclass(frozen=True)
class LossConfig:
    ss_loss: bool = False
    ss_loss_reg: float = 0.1
    ss_loss_abs: bool = False
    data_noise_std: float = 0.0


class TrainState(struct.PyTreeNode):
    step: Array
    params: Any
    model_state: Any
    opt_state: Any


def create_train_state(
    model: Model, tx: optax.GradientTransformation, key: Array
) -> TrainState:
    params, state = model.init(key)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        model_state=state,
        opt_state=tx.init(params),
    )


def _cast_model(model: Model, compute_dtype) -> Model:
    """Wrap a model so its forward runs in ``compute_dtype`` (logits back in
    f32).  No-op when compute_dtype is None."""
    if compute_dtype is None:
        return model
    import dataclasses

    inner_apply = model.apply

    def apply(params, state, x, *args, **kwargs):
        logits, new_state, aux = inner_apply(
            params, state, x.astype(compute_dtype), *args, **kwargs
        )
        aux = {k: v.astype(jnp.float32) for k, v in aux.items()}
        return logits.astype(jnp.float32), new_state, aux

    return dataclasses.replace(model, apply=apply)


def _noise_solvers(solvers, key, noise_cfg: NoiseConfig):
    if noise_cfg.noise_type is None:
        return list(solvers)
    keys = jax.random.split(key, len(solvers))
    return [
        noise_solver(
            s, k, std=noise_cfg.sigma, bernoulli_p=noise_cfg.prob,
            noise_type=noise_cfg.noise_type,
            minimize_rk2_error=noise_cfg.minimize_rk2_error,
        )
        for s, k in zip(solvers, keys)
    ]


def _run_attack(model, params, state, solvers, options, attack_cfg,
                x, y, k_attack, k_fwd, remat, unroll,
                integration_method="backprop"):
    """Build the adversarial batch.  The attack forward runs in eval mode
    (reference FGSM/PGD set model.eval(), fgsm.py:23-25)."""

    def fwd(xi, k=None):
        logits, _, _ = model.apply(
            params, state, xi, solvers, options,
            key=k_fwd if k is None else k, train=False,
            remat=remat, unroll=unroll,
            integration_method=integration_method,
        )
        return logits

    m = attack_cfg.mode
    if m == "clean":
        return clean_attack(x, y)[0]
    if m == "fgsm":
        return fgsm(fwd, x, y, attack_cfg.eps, attack_cfg.mean,
                    attack_cfg.std)[0]
    if m == "fgsm_random":
        return fgsm_random(
            fwd, k_attack, x, y, attack_cfg.eps, attack_cfg.alpha,
            attack_cfg.mean, attack_cfg.std,
        )[0]
    if m == "at":
        # fwd_key: each PGD iteration resamples the regime draw like the
        # reference's per-forward np.random (noop for standalone)
        return pgd(
            fwd, k_attack, x, y, attack_cfg.eps, attack_cfg.pgd_lr,
            attack_cfg.pgd_niter, attack_cfg.pgd_random_start,
            attack_cfg.mean, attack_cfg.std, fwd_key=k_fwd,
        )[0]
    raise ValueError("Attack type not understood.")


def make_train_step(
    model: Model,
    tx: optax.GradientTransformation,
    solvers: Sequence[ParametricSolver],
    solver_options: SolverOptions = SolverOptions(),
    attack_cfg: AttackConfig = AttackConfig(),
    noise_cfg: NoiseConfig = NoiseConfig(),
    loss_cfg: LossConfig = LossConfig(),
    *,
    remat: bool = False,
    unroll: int = 1,
    donate: bool = True,
    jit_compile: bool = True,
    compute_dtype=None,
    skip_nonfinite: bool = False,
    integration_method: str = "backprop",
    compiler_options: dict | None = None,
):
    """Returns ``step(ts, x, y, key) -> (ts, metrics)`` (jitted unless
    ``jit_compile=False`` — e.g. when the caller re-jits with mesh shardings
    via ``parallel.make_parallel_train_step``).

    ``compiler_options`` are backend compiler flag overrides passed to
    :func:`jax.jit` (``CompileOptions.env_option_overrides``) — e.g.
    ``{"xla_tpu_scoped_vmem_limit_kib": "65536"}``.  They reach the
    remote TPU compiler even where the ``XLA_FLAGS`` env var cannot
    (SCALING.md "TPU compiler flags ARE reachable"); unknown flags fail
    the compile loudly.  The reference has no analog (apex/cuDNN expose
    no per-step compiler control).

    ``compute_dtype=jnp.bfloat16`` enables mixed precision: activations (and
    hence MXU matmuls, which the layer library casts kernels to match) run in
    bf16 with f32 accumulation, while master params, the optimizer state, and
    the loss stay f32 — the TPU-native replacement for the reference's
    apex.amp O1 (train_and_attack.py:497-500).  Attack input-gradients are
    taken w.r.t. the f32 image through the cast.
    """
    model = _cast_model(model, compute_dtype)

    def step(ts: TrainState, x: Array, y: Array, key: Array,
             dynamic_solvers=None):
        """``dynamic_solvers`` (optional pytree of ParametricSolvers with the
        same static structure) overrides the closed-over solver list *as a
        traced argument*, so e.g. a u-sweep reuses ONE compilation across all
        coefficient values instead of re-jitting per u."""
        k_noise, k_attack, k_afwd, k_fwd, k_data = jax.random.split(key, 5)

        base = solvers if dynamic_solvers is None else list(dynamic_solvers)
        solvers_t = _noise_solvers(base, k_noise, noise_cfg)

        x_adv = _run_attack(
            model, ts.params, ts.model_state, solvers_t, solver_options,
            attack_cfg, x, y, k_attack, k_afwd, remat, unroll,
            integration_method,
        )

        if loss_cfg.data_noise_std > 1e-12:
            x_adv = x_adv + loss_cfg.data_noise_std * jax.random.normal(
                k_data, x_adv.shape, x_adv.dtype
            )

        def loss_fn(params):
            logits, new_state, aux = model.apply(
                params, ts.model_state, x_adv, solvers_t, solver_options,
                key=k_fwd, train=True, ss_loss=loss_cfg.ss_loss,
                ss_loss_abs=loss_cfg.ss_loss_abs, remat=remat, unroll=unroll,
                integration_method=integration_method,
            )
            xent = cross_entropy(logits, y)
            loss = xent
            if loss_cfg.ss_loss:
                loss = loss + loss_cfg.ss_loss_reg * aux["ss_loss"]
            return loss, (new_state, logits, xent, aux["ss_loss"])

        (loss, (new_state, logits, xent, ss)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(ts.params)

        gnorm = optax.global_norm(grads)
        if skip_nonfinite:
            # Failure containment: a non-finite loss/grad skips the update
            # instead of poisoning the params (production-run guard the
            # reference lacks; the epoch is not lost, just the batch).
            # The skip decision is routed through the gradient stream:
            # when skipping, grads are forced to NaN so any nonfinite-aware
            # wrapper in the optimizer chain (with_nonfinite_backoff, at
            # ANY nesting depth — e.g. under optax.MultiSteps) observes the
            # same predicate as this step's revert, keeping its scale-dip /
            # n_skipped bookkeeping consistent with the batches the params
            # actually skipped (a non-finite loss with finite grads would
            # otherwise advance momentum the params never absorbed).
            ok = jnp.isfinite(loss) & jnp.isfinite(gnorm)
            grads_upd = jax.tree_util.tree_map(
                lambda g: jnp.where(ok, g, jnp.full_like(g, jnp.nan)), grads
            )
        else:
            grads_upd = grads

        updates, new_opt_state = tx.update(grads_upd, ts.opt_state, ts.params)
        new_params = optax.apply_updates(ts.params, updates)

        if skip_nonfinite:
            from .optimizers import NonfiniteBackoffState

            new_params = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok, new, old),
                new_params, ts.params,
            )
            # Revert the optimizer state on skip — except
            # NonfiniteBackoffState nodes (wherever they sit in the state
            # tree): their update already preserved the inner state on the
            # NaN-forced grads AND recorded the event (scale dip,
            # n_skipped); reverting them would silently undo the backoff.
            new_opt_state = jax.tree_util.tree_map(
                lambda new, old: new
                if isinstance(new, NonfiniteBackoffState)
                else (jnp.where(ok, new, old)
                      if hasattr(new, "dtype") else new),
                new_opt_state, ts.opt_state,
                is_leaf=lambda x: isinstance(x, NonfiniteBackoffState),
            )

        acc = jnp.mean((jnp.argmax(logits, axis=-1) == y).astype(jnp.float32))
        metrics = {
            "loss": loss,
            "xentropy": xent,
            "ss_loss": ss,
            "accuracy": acc,
            "grad_norm": gnorm,
        }
        if skip_nonfinite:
            metrics["skipped_nonfinite"] = (~ok).astype(jnp.float32)
            # a skipped batch must not poison BN/SN running statistics
            # either: NaN means/vars would make every later (eval-mode)
            # forward non-finite and freeze the run
            new_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok, new, old)
                if hasattr(new, "dtype") else new,
                new_state, ts.model_state,
            )
        ts = ts.replace(
            step=ts.step + 1,
            params=new_params,
            model_state=new_state,
            opt_state=new_opt_state,
        )
        return ts, metrics

    if not jit_compile:
        if compiler_options:
            raise ValueError(
                "compiler_options requires jit_compile=True (pass them to "
                "the outer jit / make_parallel_train_step instead)"
            )
        return step
    return jax.jit(step, donate_argnums=(0,) if donate else (),
                   compiler_options=compiler_options)


def make_eval_step(
    model: Model,
    solvers: Sequence[ParametricSolver],
    solver_options: SolverOptions = SolverOptions(),
    *,
    remat: bool = False,
    unroll: int = 1,
    compute_dtype=None,
):
    """Returns jitted ``predict(params, state, x, key) -> logits``.

    ``predict`` also accepts ``dynamic_solvers`` to override the solver list
    as a traced argument (single compilation across coefficient sweeps)."""
    model = _cast_model(model, compute_dtype)

    def predict(params, state, x, key=None, dynamic_solvers=None):
        logits, _, _ = model.apply(
            params, state, x,
            solvers if dynamic_solvers is None else list(dynamic_solvers),
            solver_options, key=key, train=False,
            remat=remat, unroll=unroll,
        )
        return logits

    return jax.jit(predict)
