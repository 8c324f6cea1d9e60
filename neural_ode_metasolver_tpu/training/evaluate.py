"""Evaluation harness: clean / adversarial / ensemble accuracies + sn_test.

Parity targets:
  * ``accuracy`` — odenet_mnist/metrics.py:9-24 (normalized by total samples)
  * ``adversarial_accuracy`` — train_and_attack.py:212-243 / notebook cell 10
  * ``accuracy_ensemble`` / ``adversarial_accuracy_ensemble`` — model
    ensembling by softmax-prob averaging over (model, solver) pairs, attacked
    jointly with FGSM2Ensemble (cifar10 Evaluate nb cell 25; fgsm.py:121-155)
  * ``sn_test`` — re-evaluate a trained model under different step counts
    (odenet_mnist/metrics.py:27-41): grid size is a late-bound eval knob, each
    step count triggering one fresh jit specialization.
"""
from __future__ import annotations

from typing import Iterable, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..attacks import fgsm2ensemble
from ..models.api import Model
from ..ops.regimes import SolverOptions
from ..ops.solver import ParametricSolver
from .train import AttackConfig, _run_attack, make_eval_step

Array = jax.Array

__all__ = [
    "accuracy",
    "adversarial_accuracy",
    "make_adversarial_predict",
    "accuracy_ensemble",
    "make_ensemble_probs",
    "make_ensemble_attacked_probs",
    "adversarial_accuracy_ensemble",
    "sn_test",
    "RegimeSpec",
    "notebook_regime_grid",
]


def _drain_counts(counts, total) -> float:
    """Accuracy from per-batch on-device correct-counts.

    Counts stay on device during the loop (one jax.device_get at the end)
    so eval batches pipeline through the async dispatch queue instead of
    blocking on a readback per batch — same discipline as the fit loop
    (SCALING.md 'input-pipeline discipline')."""
    correct = int(np.sum(jax.device_get(counts))) if counts else 0
    return correct / max(total, 1)


def _accumulate_accuracy(data, batch_scores) -> float:
    """The one counting loop shared by every accuracy entry point:
    ``batch_scores(x, y)`` returns per-batch logits or probs; argmax
    counts accumulate on device (see ``_drain_counts``)."""
    counts = []
    total = 0
    for x, y in data:
        scores = batch_scores(x, y)
        counts.append(jnp.sum(jnp.argmax(scores, -1) == jnp.asarray(y)))
        total += int(np.asarray(y).shape[0])
    return _drain_counts(counts, total)


def accuracy(
    model: Model,
    params,
    state,
    solvers: Sequence[ParametricSolver],
    solver_options: SolverOptions,
    data: Iterable[Tuple[np.ndarray, np.ndarray]],
    key: Optional[Array] = None,
    predict=None,
) -> float:
    """``predict`` (from ``make_eval_step``) may be passed in to reuse a
    compiled eval step across epochs; otherwise one is built per call."""
    if predict is None:
        predict = make_eval_step(model, solvers, solver_options)

    def batch_scores(x, y):
        nonlocal key
        sub = None
        if key is not None:
            key, sub = jax.random.split(key)
        return predict(params, state, jnp.asarray(x), sub)

    return _accumulate_accuracy(data, batch_scores)


def make_adversarial_predict(
    model: Model,
    solvers: Sequence[ParametricSolver],
    solver_options: SolverOptions,
    attack_cfg: AttackConfig,
    *,
    remat: bool = False,
    unroll: int = 1,
):
    """Build the jitted attack->forward evaluator once; pass it to
    ``adversarial_accuracy(..., predict=...)`` to reuse the compiled
    attack-through-the-ODE-solve graph across epochs (a fresh closure per
    call would retrace/recompile every time).

    Attack dispatch is shared with the train step (``_run_attack``), so
    every train mode — clean / fgsm / fgsm_random / at — evaluates with
    the same AttackConfig it was trained with.  ``remat``/``unroll``
    shape the attack's input-gradient graph exactly as in
    ``make_train_step`` — a config that needed rematerialization to fit
    training must be able to fit its adversarial eval too."""

    @jax.jit
    def attacked_logits(params, state, x, y, k_attack, k_fwd):
        xa = _run_attack(
            model, params, state, solvers, solver_options, attack_cfg,
            x, y, k_attack, k_fwd, remat, unroll,
        )
        logits, _, _ = model.apply(
            params, state, xa, solvers, solver_options,
            key=k_fwd, train=False,
        )
        return logits

    return attacked_logits


def adversarial_accuracy(
    model: Model,
    params,
    state,
    solvers: Sequence[ParametricSolver],
    solver_options: SolverOptions,
    data: Iterable[Tuple[np.ndarray, np.ndarray]],
    attack_cfg: AttackConfig,
    key: Array,
    predict=None,
    *,
    remat: bool = False,
    unroll: int = 1,
) -> float:
    """Attack every batch, then no-grad forward (train_and_attack.py:212-243).

    ``predict`` (from :func:`make_adversarial_predict`) may be passed in to
    reuse the compiled attack+forward across epochs; otherwise
    ``remat``/``unroll`` shape the one built here."""
    if predict is None:
        predict = make_adversarial_predict(
            model, solvers, solver_options, attack_cfg,
            remat=remat, unroll=unroll,
        )

    def batch_scores(x, y):
        nonlocal key
        key, k_attack, k_fwd = jax.random.split(key, 3)
        return predict(
            params, state, jnp.asarray(x), jnp.asarray(y), k_attack, k_fwd
        )

    return _accumulate_accuracy(data, batch_scores)


def _make_member_fwd(model):
    """Forward-closure factory for one ensemble member."""

    def make_fwd(params, state, solvers, options, k):
        def fwd(xi):
            logits, _, _ = model.apply(
                params, state, xi, solvers, options, key=k, train=False
            )
            return logits

        return fwd

    return make_fwd


def _homogeneous_solver_members(members):
    """Detect the ensemble-by-noising shape: every member shares params/
    state/options and carries ONE solver differing only in (u, v).
    Raises ValueError (the one error both mesh-sharded ensemble eval
    entry points share) when members don't fit that shape."""
    err = ValueError(
        "mesh-sharded ensemble eval needs homogeneous members "
        "(same params/state/options, one solver varying only in "
        "u/v — what solver_ensemble_by_noising produces)"
    )
    p0, s0, sol0, o0 = members[0]
    if len(sol0) != 1:
        raise err
    for p, s, sol, o in members[1:]:
        if p is not p0 or s is not s0 or o != o0 or len(sol) != 1:
            raise err
    from ..parallel.ensemble import stack_solver_params

    try:
        ref, u, v = stack_solver_params([m[2][0] for m in members])
    except ValueError:
        raise err from None
    return p0, s0, o0, ref, u, v


def _solver_static_sig(s: ParametricSolver):
    return (s.method, s.parameterization, s.n_steps, s.step_size,
            s.custom_grid, s.frozen)


def _vmapped_member_probs(model, options, ref, mesh, member_axis):
    """``probs(params, state, u_stack, v_stack, x, keys) ->
    (n_members, B, n_classes)`` vmapped over the stacked solver
    coefficients, member axis sharded over ``mesh`` — each member's full
    ODE solve runs on its own mesh slice (parallel/ensemble.py's layout,
    reaching the eval harness).  Only static structure (``options`` and
    ``ref``'s non-leaf metadata) is baked; params/state/coefficients flow
    as call arguments so reuse across epochs sees fresh values."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def probs_fn(params, state, u_stack, v_stack, x, keys):
        def member(u_i, v_i, k):
            s = ref.replace(u=u_i) if v_i is None else ref.replace(
                u=u_i, v=v_i)
            logits, _, _ = model.apply(params, state, x, [s], options,
                                       key=k, train=False)
            return jax.nn.softmax(logits, axis=-1)

        if v_stack is None:
            probs = jax.vmap(lambda ui, k: member(ui, None, k))(
                u_stack, keys)
        else:
            probs = jax.vmap(member)(u_stack, v_stack, keys)
        if mesh is not None:
            probs = jax.lax.with_sharding_constraint(
                probs, NamedSharding(mesh, P(member_axis)))
        return probs

    return probs_fn


def make_ensemble_probs(
    model: Model,
    members: Sequence[Tuple],
    *,
    mesh=None,
    member_axis: str = "ensemble",
):
    """Build the jitted prob-averaging closure ``probs_fn(members, x,
    keys)`` ONCE; pass it to ``accuracy_ensemble(..., predict=...)`` to
    reuse the compiled multi-member ODE-solve graph across epochs (same
    rationale as :func:`make_adversarial_predict` — a fresh closure per
    call retraces every time, 5-10+ min per compile on the remote chip).

    Only static structure (member count, options, solver families) is
    baked at build time; params/state/coefficients are taken from the
    ``members`` passed at CALL time, so per-epoch reuse evaluates the
    current weights, not the build-time ones.  A structural mismatch
    between build- and call-time members raises."""
    n_members = len(members)

    if mesh is not None:
        _, _, options, ref, _, _ = _homogeneous_solver_members(members)
        vprobs = jax.jit(_vmapped_member_probs(model, options, ref, mesh,
                                               member_axis))
        ref_sig = _solver_static_sig(ref)

        def probs_fn(members, x, keys):
            p0, s0, opts, ref_now, u_stack, v_stack = (
                _homogeneous_solver_members(members)
            )
            if (len(members) != n_members or opts != options
                    or _solver_static_sig(ref_now) != ref_sig):
                raise ValueError(
                    "ensemble closure was built for a different member "
                    "structure — rebuild with make_ensemble_probs"
                )
            if keys[0] is None:
                # match the member-loop path: key-consuming regimes must
                # raise, not silently run on a fabricated seed
                # (meta_integrate, ops/regimes.py:121,140)
                if options.solver_mode in ("switch", "ensemble"):
                    raise ValueError(
                        f"{options.solver_mode} mode needs a PRNG key")
                # standalone never consumes the keys; any placeholder works
                keys = jax.random.split(jax.random.key(0), n_members)
            else:
                keys = jnp.stack(keys)
            return jnp.mean(vprobs(p0, s0, u_stack, v_stack, x, keys),
                            axis=0)

        return probs_fn

    make_fwd = _make_member_fwd(model)
    options_list = tuple(m[3] for m in members)

    @jax.jit
    def _probs(dyn, x, keys):
        probs = None
        for (params, state, solvers), options, k in zip(
                dyn, options_list, keys):
            p = jax.nn.softmax(
                make_fwd(params, state, solvers, options, k)(x), axis=-1
            )
            probs = p if probs is None else probs + p
        return probs / n_members

    def probs_fn(members, x, keys):
        if (len(members) != n_members
                or tuple(m[3] for m in members) != options_list):
            raise ValueError(
                "ensemble closure was built for a different member "
                "structure — rebuild with make_ensemble_probs"
            )
        dyn = [(p, s, sol) for (p, s, sol, _) in members]
        return _probs(dyn, x, keys)

    return probs_fn


def accuracy_ensemble(
    model: Model,
    members: Sequence[Tuple],
    data,
    key: Optional[Array] = None,
    *,
    mesh=None,
    member_axis: str = "ensemble",
    predict=None,
) -> float:
    """Softmax-prob-averaged ensemble accuracy (Evaluate nb cell 25).

    ``members``: list of (params, state, solvers, solver_options).

    ``mesh``: shard the member axis over this mesh axis instead of looping
    members sequentially — each member's full ODE solve runs on its own
    device slice (ensemble parallelism reaching the eval harness).
    Requires the ensemble-by-noising shape: shared params/state/options,
    one solver per member differing only in (u, v).

    ``predict``: a closure from :func:`make_ensemble_probs`, reused across
    calls so a per-epoch ensemble eval doesn't retrace/recompile the full
    multi-member ODE-solve graph every epoch (the current ``members`` are
    still what gets evaluated — params flow as call arguments)."""
    probs_fn = predict if predict is not None else make_ensemble_probs(
        model, members, mesh=mesh, member_axis=member_axis
    )

    def batch_scores(x, y):
        nonlocal key
        if key is not None:
            key, *subs = jax.random.split(key, len(members) + 1)
            subs = list(subs)
        else:
            subs = [None] * len(members)
        return probs_fn(members, jnp.asarray(x), subs)

    return _accumulate_accuracy(data, batch_scores)


def make_ensemble_attacked_probs(
    model: Model,
    members: Sequence[Tuple],
    attack_cfg: AttackConfig,
    *,
    mesh=None,
    member_axis: str = "ensemble",
    remat: bool = False,
):
    """Build the jitted joint-attack + prob-average closure
    ``attacked_probs(members, x, y, keys)`` once (reuse and
    params-as-call-arguments rationale as :func:`make_ensemble_probs`).

    ``remat`` rematerializes each member forward inside the joint
    attack's input-gradient graph — the ensemble attack differentiates
    through EVERY member's full ODE solve at once, so its residual
    footprint is n_members x the single-model attack's (which alone
    compiled at 36.13G HBM at batch 256 — the round-4 postmortem)."""
    n_members = len(members)

    if mesh is not None:
        _, _, options, ref, _, _ = _homogeneous_solver_members(members)
        vprobs = _vmapped_member_probs(model, options, ref, mesh,
                                       member_axis)
        ref_sig = _solver_static_sig(ref)
        from ..attacks import fgsm_mean_prob_attack

        @jax.jit
        def _attacked(params, state, u_stack, v_stack, x, y, keys):
            # the vmapped mean-prob closure feeds the SAME attack core as
            # the member-loop path (fgsm2ensemble) — one copy of the
            # reference-parity semantics for both
            mean_probs = lambda xn: jnp.mean(
                vprobs(params, state, u_stack, v_stack, xn, keys),
                axis=0)
            xa, _ = fgsm_mean_prob_attack(
                jax.checkpoint(mean_probs) if remat else mean_probs,
                x, y, attack_cfg.eps, attack_cfg.mean, attack_cfg.std,
            )
            return jnp.mean(
                vprobs(params, state, u_stack, v_stack, xa, keys), axis=0)

        def attacked_probs(members, x, y, keys):
            p0, s0, opts, ref_now, u_stack, v_stack = (
                _homogeneous_solver_members(members)
            )
            if (len(members) != n_members or opts != options
                    or _solver_static_sig(ref_now) != ref_sig):
                raise ValueError(
                    "ensemble closure was built for a different member "
                    "structure — rebuild with make_ensemble_attacked_probs"
                )
            return _attacked(p0, s0, u_stack, v_stack, x, y,
                             jnp.stack(keys))

        return attacked_probs

    make_fwd = _make_member_fwd(model)
    options_list = tuple(m[3] for m in members)

    @jax.jit
    def _attacked(dyn, x, y, keys):
        fwds = [
            make_fwd(params, state, solvers, options, k)
            for (params, state, solvers), options, k in zip(
                dyn, options_list, keys)
        ]
        # remat only the attack's differentiated forwards; the post-attack
        # prob average below is grad-free and keeps the plain closures
        atk_fwds = [jax.checkpoint(f) for f in fwds] if remat else fwds
        xa, _ = fgsm2ensemble(atk_fwds, x, y, attack_cfg.eps,
                              attack_cfg.mean, attack_cfg.std)
        probs = None
        for fwd in fwds:
            p = jax.nn.softmax(fwd(xa), axis=-1)
            probs = p if probs is None else probs + p
        return probs / n_members

    def attacked_probs(members, x, y, keys):
        if (len(members) != n_members
                or tuple(m[3] for m in members) != options_list):
            raise ValueError(
                "ensemble closure was built for a different member "
                "structure — rebuild with make_ensemble_attacked_probs"
            )
        dyn = [(p, s, sol) for (p, s, sol, _) in members]
        return _attacked(dyn, x, y, keys)

    return attacked_probs


def adversarial_accuracy_ensemble(
    model: Model,
    members: Sequence[Tuple],
    data,
    attack_cfg: AttackConfig,
    key: Array,
    *,
    mesh=None,
    member_axis: str = "ensemble",
    predict=None,
    remat: bool = False,
) -> float:
    """FGSM2Ensemble attack + prob-averaged eval (nb cell 25; fgsm.py:109-155).

    ``mesh``: member-axis-sharded variant (see :func:`accuracy_ensemble`);
    the joint ensemble attack differentiates through the vmapped
    prob-average, mathematically identical to fgsm2ensemble's
    log-mean-prob NLL.

    ``predict``: a closure from :func:`make_ensemble_attacked_probs`,
    reused across calls to avoid per-epoch recompiles (the current
    ``members`` are still what gets attacked and evaluated)."""
    attacked_probs = (
        predict if predict is not None else make_ensemble_attacked_probs(
            model, members, attack_cfg, mesh=mesh, member_axis=member_axis,
            remat=remat,
        )
    )

    def batch_scores(x, y):
        nonlocal key
        key, *subs = jax.random.split(key, len(members) + 1)
        return attacked_probs(
            members, jnp.asarray(x), jnp.asarray(y), list(subs)
        )

    return _accumulate_accuracy(data, batch_scores)


def sn_test(
    model: Model,
    params,
    state,
    solver: ParametricSolver,
    solver_options: SolverOptions,
    data_factory,
    nsteps_grid: Sequence[int],
    key: Optional[Array] = None,
):
    """Step-count robustness sweep (odenet_mnist/metrics.py:27-41).

    ``data_factory()`` must return a fresh iterable per evaluation.  Returns
    the accuracy list aligned with ``nsteps_grid``.
    """
    accs = []
    for n in nsteps_grid:
        # clear ALL grid sources besides n_steps — a leftover custom_grid
        # would win in time_grid() and make every sweep point identical
        s = solver.replace(n_steps=int(n), step_size=None, custom_grid=None)
        accs.append(
            accuracy(model, params, state, [s], solver_options,
                     data_factory(), key)
        )
    return accs


class RegimeSpec(NamedTuple):
    """One row of the Evaluate-notebook regime grid (cells 13-28).

    ``solvers``/``options`` drive ``accuracy``/``adversarial_accuracy``;
    for the model-ensembling row they are instead the noised member
    solvers to be paired with ``(params, state)`` and fed to
    ``accuracy_ensemble``/``adversarial_accuracy_ensemble`` (signalled by
    ``is_model_ensemble``).  ``needs_key``: the regime draws per-batch RNG
    (switch / solver-ensemble coin) during CLEAN eval too.
    """

    name: str
    solvers: Sequence[ParametricSolver]
    options: SolverOptions
    is_model_ensemble: bool = False
    needs_key: bool = False


def notebook_regime_grid(
    base_solver: ParametricSolver,
    noise_key: Array,
    *,
    u_alt: float = 1.0,
    switch_probs: Sequence[float] = (0.6, 0.4),
    ensemble_weights: Sequence[float] = (0.6, 0.4),
    ensemble_size: int = 2,
    noise_std: float = 0.2,
    noise_type: str = "normal",
) -> "list[RegimeSpec]":
    """The reference's four-regime evaluation grid, as data.

    The ONE construction of the Evaluate-notebook table (cifar10
    ``Evaluate the model.ipynb`` cells 13-28; BASELINE.md rows 7-10) so
    drivers (``scripts/replicate_baseline.py``,
    ``scripts/digits_regimes_eval.py``) can never drift apart:

      1. standalone               — ``base_solver`` alone
      2. switch[p...]             — {base, u=u_alt} under switch_probs
      3. solver_ens[w...]         — same pair, ensemble_prob=1, weights
      4. model_ensembling         — ``ensemble_size`` sigma=``noise_std``
                                    ``noise_type``-noised copies (original
                                    first, utils.py:112-117), evaluated by
                                    softmax-prob averaging with joint
                                    ensemble-FGSM (nb cell 25)
    """
    from ..ops.noise import solver_ensemble_by_noising

    alt = base_solver.replace(u=u_alt, u0=u_alt)
    fmt = lambda xs: ",".join(f"{x:g}" for x in xs)
    noised = solver_ensemble_by_noising(
        base_solver, noise_key, ensemble_size=ensemble_size,
        std=noise_std, noise_type=noise_type,
    )
    return [
        RegimeSpec("standalone", [base_solver], SolverOptions()),
        RegimeSpec(
            f"switch[{fmt(switch_probs)}]", [base_solver, alt],
            SolverOptions(solver_mode="switch",
                          switch_probs=list(switch_probs)),
            needs_key=True,
        ),
        RegimeSpec(
            f"solver_ens[{fmt(ensemble_weights)}]", [base_solver, alt],
            SolverOptions(solver_mode="ensemble", ensemble_prob=1.0,
                          ensemble_weights=list(ensemble_weights)),
            needs_key=True,
        ),
        RegimeSpec("model_ensembling", noised, SolverOptions(),
                   is_model_ensemble=True),
    ]
