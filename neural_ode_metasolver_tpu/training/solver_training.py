"""Trainable solver parameters: optimize (u, v) jointly with the network.

The reference's only end-to-end wiring of *trainable* solver coefficients is
the legacy torchdiffeq path (odenet_mnist/runner_old.py:184-185: a separate
``lr_uv`` param group for ``u``/``v``); the rewritten solvers kept
``freeze/unfreeze`` but no optimizer hookup.  Here it is first-class: solver
(u, v) live in the TrainState next to the model params, get their own optax
transformation (the ``lr_uv`` analog), and receive gradients through the
integration scan — the tableau constructors are differentiable end to end
(ops/tableau.py).

Solver smoothing is NOT wired into this step (``make_solver_train_step``
takes no ``NoiseConfig``): perturbing coefficients that are simultaneously
being optimized would feed noise into their own gradient stream. Train
with smoothing via ``make_train_step`` (frozen solvers) or optimize (u, v)
here — the regimes are separate by design.
"""
from __future__ import annotations

from typing import Any, List, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..attacks import cross_entropy
from ..models.api import Model
from ..ops.regimes import SolverOptions
from ..ops.solver import ParametricSolver
from .train import AttackConfig, LossConfig, _cast_model, _run_attack

Array = jax.Array

__all__ = [
    "SolverTrainState",
    "create_solver_train_state",
    "make_solver_train_step",
    "solvers_from_state",
]


class SolverTrainState(struct.PyTreeNode):
    step: Array
    params: Any
    model_state: Any
    opt_state: Any
    solver_params: Any  # list of {"u": scalar, "v": scalar|None}
    solver_opt_state: Any


def _extract_params(solvers: Sequence[ParametricSolver]):
    out = []
    for s in solvers:
        out.append({
            "u": None if s.u is None else jnp.asarray(s.u),
            "v": None if s.v is None else jnp.asarray(s.v),
        })
    return out


def solvers_from_state(
    solvers: Sequence[ParametricSolver], solver_params
) -> List[ParametricSolver]:
    """Rebuild unfrozen solvers carrying the trainable (u, v)."""
    out = []
    for s, sp in zip(solvers, solver_params):
        out.append(s.replace(u=sp["u"], v=sp["v"], frozen=False))
    return out


def create_solver_train_state(
    model: Model,
    tx: optax.GradientTransformation,
    solver_tx: optax.GradientTransformation,
    solvers: Sequence[ParametricSolver],
    key: Array,
) -> SolverTrainState:
    params, state = model.init(key)
    solver_params = _extract_params(solvers)
    return SolverTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        model_state=state,
        opt_state=tx.init(params),
        solver_params=solver_params,
        solver_opt_state=solver_tx.init(solver_params),
    )


def make_solver_train_step(
    model: Model,
    tx: optax.GradientTransformation,
    solver_tx: optax.GradientTransformation,
    solvers: Sequence[ParametricSolver],
    solver_options: SolverOptions = SolverOptions(),
    attack_cfg: AttackConfig = AttackConfig(),
    loss_cfg: LossConfig = LossConfig(),
    *,
    clip_solver_params: bool = True,
    remat: bool = False,
    unroll: int = 1,
    donate: bool = True,
    jit_compile: bool = True,
    compute_dtype=None,
):
    """Like ``make_train_step`` but with (u, v) as trainable leaves.

    ``solver_tx`` is the u/v optimizer (reference ``lr_uv`` param group).
    ``clip_solver_params`` re-clips u, v after each update into a range
    strictly INSIDE each family's tableau validity clamp (rk2/rk3 clamp
    to [eps, 1], rk4 to [eps, 1-eps] — ops/tableau.py), so the raw
    parameters track the region where d(tableau)/du is nonzero. Clipping
    rk4's u to 1.0 would park it exactly on the tableau clamp boundary
    with zero gradient forever.
    """
    model = _cast_model(model, compute_dtype)
    # per-solver post-update clip bounds: stay inside the validity clamp
    clip_hi = tuple(
        1.0 - 1e-3 if s.method == "rk4" else 1.0 for s in solvers
    )

    # rk4 'uv' has a pole at u=1/2: the tableau clamp saturates in a band of
    # width validity_eps around it (ops/tableau.py:195-199), where
    # d(tableau)/du is exactly zero.  2e-3 > validity_eps(f32) = f16 eps, so
    # pushing u to the nearest band edge keeps the gradient alive.
    # rk3 has a pole at u=2/3 (w32 = v(v-u)/(u(2-3u)), ops/tableau.py) with
    # NO saturating clamp in the tableau itself — coefficients explode
    # continuously as u -> 2/3, so a trained u drifting there produces
    # inf/NaN stage couplings; keep it a band away too.
    _POLE_BAND = 2e-3

    def _keep_off_pole(u, pole):
        return jnp.where(
            jnp.abs(u - pole) < _POLE_BAND,
            jnp.where(u < pole, pole - _POLE_BAND, pole + _POLE_BAND),
            u,
        )

    def _clip_sp(sp, s, hi):
        sp = jax.tree_util.tree_map(lambda p: jnp.clip(p, 1e-3, hi), sp)
        if s.method == "rk4" and s.parameterization == "uv":
            sp = dict(sp, u=_keep_off_pole(sp["u"], 0.5))
        if s.method == "rk3" and "u" in sp:
            sp = dict(sp, u=_keep_off_pole(sp["u"], 2.0 / 3.0))
        return sp

    # only widen the key split when data noise is on, so existing
    # data_noise_std=0 configs keep their recorded PRNG streams
    use_data_noise = loss_cfg.data_noise_std > 1e-12

    def step(ts: SolverTrainState, x: Array, y: Array, key: Array):
        if use_data_noise:
            k_attack, k_afwd, k_data, k_fwd = jax.random.split(key, 4)
        else:
            k_attack, k_afwd, k_fwd = jax.random.split(key, 3)
            k_data = None

        solvers_cur = solvers_from_state(solvers, ts.solver_params)
        x_adv = _run_attack(
            model, ts.params, ts.model_state, solvers_cur, solver_options,
            attack_cfg, x, y, k_attack, k_afwd, remat, unroll,
        )

        if use_data_noise:
            x_adv = x_adv + loss_cfg.data_noise_std * jax.random.normal(
                k_data, x_adv.shape, x_adv.dtype
            )

        def loss_fn(params, solver_params):
            solvers_inner = solvers_from_state(solvers, solver_params)
            logits, new_state, aux = model.apply(
                params, ts.model_state, x_adv, solvers_inner, solver_options,
                key=k_fwd, train=True, ss_loss=loss_cfg.ss_loss,
                ss_loss_abs=loss_cfg.ss_loss_abs, remat=remat, unroll=unroll,
            )
            xent = cross_entropy(logits, y)
            loss = xent
            if loss_cfg.ss_loss:
                loss = loss + loss_cfg.ss_loss_reg * aux["ss_loss"]
            return loss, (new_state, logits, xent)

        (loss, (new_state, logits, xent)), (g_model, g_solver) = (
            jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                ts.params, ts.solver_params
            )
        )

        upd_m, opt_m = tx.update(g_model, ts.opt_state, ts.params)
        new_params = optax.apply_updates(ts.params, upd_m)
        upd_s, opt_s = solver_tx.update(
            g_solver, ts.solver_opt_state, ts.solver_params
        )
        new_solver_params = optax.apply_updates(ts.solver_params, upd_s)
        if clip_solver_params:
            new_solver_params = type(new_solver_params)(
                _clip_sp(sp, s, hi)
                for sp, s, hi in zip(new_solver_params, solvers, clip_hi)
            )

        acc = jnp.mean((jnp.argmax(logits, axis=-1) == y).astype(jnp.float32))
        metrics = {
            "loss": loss,
            "xentropy": xent,
            "accuracy": acc,
            "grad_norm": optax.global_norm(g_model),
            "solver_grad_norm": optax.global_norm(g_solver),
        }
        for i, sp in enumerate(new_solver_params):
            metrics[f"solver{i}_u"] = sp["u"]
            if sp["v"] is not None:
                metrics[f"solver{i}_v"] = sp["v"]

        ts = ts.replace(
            step=ts.step + 1,
            params=new_params,
            model_state=new_state,
            opt_state=opt_m,
            solver_params=new_solver_params,
            solver_opt_state=opt_s,
        )
        return ts, metrics

    if not jit_compile:
        return step
    return jax.jit(step, donate_argnums=(0,) if donate else ())
