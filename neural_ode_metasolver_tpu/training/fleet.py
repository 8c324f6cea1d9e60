"""Fleet training: one jitted step advances S independent runs at once.

TPU-native *experiment parallelism* — a mesh axis for the workload this
framework's own science record runs in bulk: seed replications.  The
reference replicates seeds as sequential processes (the 9-seed MNIST
u-sweep, README.md:48; the 3-seed CIFAR runs, README.md:59); its only
per-run device story is one ``cuda:N`` pick.  Here S member TrainStates
are STACKED along a leading fleet axis, the (unjitted) step from
:func:`make_train_step` is vmapped over that axis, and the whole fleet
advances in ONE device dispatch per step.  On a mesh the fleet axis
shards like any other — each device carries ``S / axis_size`` members,
embarrassingly parallel, zero collectives.

Why this pays on TPU: experiment-scale models (digits-size MNIST nets)
underutilize the chip per step, and through a tunneled chip every
dispatch costs ~0.7 ms of host latency; vmapping S members amortizes
both.  The fleet axis also composes with per-member *solver
coefficients* (``dynamic_solvers``), so a whole u-sweep arm can train as
one program.

Numerics note: per-member results match the equivalent single-run stream
to float tolerance, not bit-for-bit — vmapping a conv over its *weights*
changes XLA's lowering (batch-grouped convolution) and with it the
accumulation order.  A fleet campaign is therefore its own numerics
stream: don't mix its raw per-seed rows with stored single-run rows when
asserting bit-determinism (statistical pooling is fine, and the paired
CRN design is unaffected — both arms of a pair run under the same
lowering).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..models.api import Model
from ..ops.regimes import SolverOptions
from ..ops.solver import ParametricSolver
from .train import (
    AttackConfig,
    LossConfig,
    NoiseConfig,
    TrainState,
    _cast_model,
    _run_attack,
    create_train_state,
    make_train_step,
)

Array = jax.Array

__all__ = [
    "fleet_keys",
    "create_fleet_state",
    "stack_fleet_solvers",
    "tile_fleet",
    "fleet_member",
    "make_fleet_train_step",
    "make_fleet_eval_step",
]


def fleet_keys(seeds: Sequence[int]) -> Array:
    """Stack per-seed PRNG keys into a (S,) key array.

    Member i's key is exactly ``jax.random.key(seeds[i])`` — the same
    root key a single-seed run of the experiment scripts uses — so a
    fleet campaign consumes the identical per-seed key chains.
    """
    return jnp.stack([jax.random.key(int(s)) for s in seeds])


def create_fleet_state(model: Model, tx, seeds_or_keys) -> TrainState:
    """A TrainState whose every leaf carries a leading fleet axis.

    Member i equals ``create_train_state(model, tx, key_i)`` (same init
    stream), just stacked.
    """
    keys = seeds_or_keys
    if not hasattr(keys, "dtype") or not jax.dtypes.issubdtype(
        keys.dtype, jax.dtypes.prng_key
    ):
        keys = fleet_keys(list(seeds_or_keys))
    return jax.vmap(lambda k: create_train_state(model, tx, k))(keys)


def stack_fleet_solvers(
    member_solvers: Sequence[Sequence[ParametricSolver]],
):
    """Stack per-member solver lists into one fleet-axis solver list.

    ``member_solvers[i]`` is member i's solver list; all members must
    share the static solver structure (method / parameterization /
    n_steps ...) and differ only in (u, v) — e.g. a u-sweep.  The result
    feeds ``dynamic_solvers`` of the fleet step.
    """
    first = member_solvers[0]
    for ms in member_solvers[1:]:
        if len(ms) != len(first):
            raise ValueError("fleet members must have equal solver counts")
    stacked = []
    for j in range(len(first)):
        base = first[j]
        for ms in member_solvers[1:]:
            s = ms[j]
            if (s.method, s.parameterization, s.n_steps, s.step_size) != (
                base.method, base.parameterization, base.n_steps,
                base.step_size,
            ):
                raise ValueError(
                    "fleet members must share solver statics "
                    "(method/parameterization/n_steps/step_size); "
                    f"solver {j}: {s} vs {base}"
                )
        # Stack dynamic leaves (u, v) only; u0/v0 are static aux data and
        # may differ per member (a u-sweep), so tree_map across members
        # would reject the mismatched treedefs — reuse member 0's statics
        # (reset() semantics follow member 0; unused inside the step).
        per_member = [jax.tree_util.tree_leaves(ms[j])
                      for ms in member_solvers]
        treedef = jax.tree_util.tree_structure(base)
        stacked.append(jax.tree_util.tree_unflatten(
            treedef, [jnp.stack(ls) for ls in zip(*per_member)]))
    return stacked


def tile_fleet(x, n_members: int):
    """Broadcast one shared batch to every fleet member: (B, ...) ->
    (S, B, ...).  Use for shared eval sets; training members usually
    carry their own batch order (stack instead)."""
    x = jnp.asarray(x)
    return jnp.broadcast_to(x[None], (n_members,) + x.shape)


def fleet_member(tree, i: int):
    """Slice member i's pytree (e.g. one seed's TrainState) out of a
    stacked fleet pytree — for checkpointing / evaluating one member
    through the single-run harnesses."""
    return jax.tree_util.tree_map(lambda l: l[i], tree)


def make_fleet_train_step(
    model: Model,
    tx,
    solvers: Sequence[ParametricSolver],
    solver_options: SolverOptions = SolverOptions(),
    attack_cfg: AttackConfig = AttackConfig(),
    noise_cfg: NoiseConfig = NoiseConfig(),
    loss_cfg: LossConfig = LossConfig(),
    *,
    donate: bool = True,
    compiler_options: Optional[dict] = None,
    **train_kwargs,
):
    """Returns ``step(fleet_ts, x, y, keys[, dynamic_solvers])``.

    Shapes: every ``fleet_ts`` leaf, ``x`` (S, B, ...), ``y`` (S, B) and
    ``keys`` (S,) carry the leading fleet axis; ``dynamic_solvers`` (from
    :func:`stack_fleet_solvers`) optionally gives each member its own
    solver coefficients.  Per-member semantics are exactly
    :func:`make_train_step`'s (same kwargs accepted); metrics come back
    with a leading (S,) axis.

    To shard the fleet over a mesh, place the stacked inputs with
    ``NamedSharding(mesh, P(axis))`` (leading-dim sharding) before
    calling — the step compiles to per-device member groups with no
    collectives.
    """
    inner = make_train_step(
        model, tx, solvers, solver_options, attack_cfg, noise_cfg,
        loss_cfg, jit_compile=False, donate=False, **train_kwargs,
    )
    dargs = (0,) if donate else ()
    plain = jax.jit(
        jax.vmap(lambda ts, x, y, k: inner(ts, x, y, k)),
        donate_argnums=dargs, compiler_options=compiler_options,
    )
    dyn = jax.jit(
        jax.vmap(lambda ts, x, y, k, ds: inner(ts, x, y, k, ds)),
        donate_argnums=dargs, compiler_options=compiler_options,
    )

    def step(fleet_ts: TrainState, x: Array, y: Array, keys: Array,
             dynamic_solvers=None):
        if dynamic_solvers is None:
            return plain(fleet_ts, x, y, keys)
        return dyn(fleet_ts, x, y, keys, dynamic_solvers)

    return step


def make_fleet_eval_step(
    model: Model,
    solvers: Sequence[ParametricSolver],
    solver_options: SolverOptions = SolverOptions(),
    *,
    attack_cfg: Optional[AttackConfig] = None,
    remat: bool = False,
    unroll: int = 1,
    compute_dtype=None,
    compiler_options: Optional[dict] = None,
):
    """Returns jitted ``counts(params, state, x, y, keys) -> (S,) int``
    per-member correct-prediction counts for one (stacked or tiled)
    batch — the fleet twin of the ``accuracy`` /
    ``adversarial_accuracy`` harnesses' per-batch kernel.

    ``attack_cfg=None`` (or mode="clean") evaluates clean accuracy;
    otherwise each member's batch is attacked through its OWN params
    with the shared config, mirroring ``make_adversarial_predict``.
    Accumulate counts on device across batches and divide by the total
    at the end (the `_drain_counts` discipline).

    Like the fleet train step, ``counts`` accepts an optional trailing
    ``dynamic_solvers`` argument (from :func:`stack_fleet_solvers`) so a
    u-sweep fleet is *evaluated* under each member's own coefficients
    too, not just trained under them.
    """
    model = _cast_model(model, compute_dtype)
    attacked = attack_cfg is not None and attack_cfg.mode != "clean"

    def member_counts(params, state, x, y, key, member_solvers):
        k_attack, k_afwd, k_fwd = jax.random.split(key, 3)
        if attacked:
            x = _run_attack(
                model, params, state, member_solvers, solver_options,
                attack_cfg, x, y, k_attack, k_afwd, remat, unroll,
            )
        logits, _, _ = model.apply(
            params, state, x, member_solvers, solver_options,
            key=k_fwd, train=False, remat=remat, unroll=unroll,
        )
        return jnp.sum(jnp.argmax(logits, -1) == y)

    plain = jax.jit(
        jax.vmap(lambda p, s, x, y, k: member_counts(
            p, s, x, y, k, list(solvers))),
        compiler_options=compiler_options,
    )
    dyn = jax.jit(
        jax.vmap(lambda p, s, x, y, k, ds: member_counts(
            p, s, x, y, k, list(ds))),
        compiler_options=compiler_options,
    )

    def counts(params, state, x, y, keys, dynamic_solvers=None):
        if dynamic_solvers is None:
            return plain(params, state, x, y, keys)
        return dyn(params, state, x, y, keys, dynamic_solvers)

    return counts
