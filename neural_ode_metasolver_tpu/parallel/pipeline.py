"""Pipeline parallelism (pp): microbatched GPipe over a stack of
same-shape stages, shard_map + ppermute over a mesh axis.

The reference's models are 2-block CNNs where pipelining never pays; this
combinator exists for the deep end of the registry (stacks of same-shape
ODE blocks, e.g. a chain of MetaODEBlocks at constant width), where a
`pp` mesh axis lets each device hold 1/S of the blocks and activations
flow stage-to-stage over ICI.

Schedule: classic GPipe fill-drain.  With S stages and M microbatches the
loop runs T = M + S - 1 ticks; at tick t, stage i computes microbatch
(t - i) when 0 <= t - i < M.  Stage i's params live only on device i
(stacked leading dim sharded over ``axis``); activations move with
``ppermute`` shift +1 each tick.

Constraints (asserted): every stage maps activations of one shape to the
same shape (true for ODE blocks — they integrate, never reshape), and the
global batch divides n_microbatches * (batch per microbatch).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["PipelineConfig", "pipeline_apply", "stack_stage_params"]


@dataclass(frozen=True)
class PipelineConfig:
    """How a model should pipeline its same-shape ODE-block stacks.

    Passed to ``make_cifar_model(cfg, pipeline=...)`` / ``apply_cifar``:
    each MetaLayer whose ODE-block count is a positive multiple of the
    ``axis`` size routes those blocks through :func:`pipeline_apply`
    (consecutive blocks grouped per stage); other layers fall back to the
    sequential loop.  ``n_microbatches=0`` means "= axis size".
    ``batch_axis`` keeps the microbatches' batch dim sharded over that
    mesh axis (compose pp with data parallelism).
    """

    mesh: Mesh
    axis: str = "pp"
    n_microbatches: int = 0
    batch_axis: Optional[str] = None

    @property
    def stages(self) -> int:
        return self.mesh.shape[self.axis]

    @property
    def microbatches(self) -> int:
        return self.n_microbatches or self.stages


def stack_stage_params(params_list):
    """Stack per-stage param trees along a new leading 'stage' axis."""
    return jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves, axis=0), *params_list
    )


def pipeline_apply(
    body: Callable,
    stacked_params,
    x: jax.Array,
    mesh: Mesh,
    *,
    axis: str = "pp",
    n_microbatches: int,
    batch_axis: Optional[str] = None,
):
    """Run ``y = body(params_S-1, ... body(params_1, body(params_0, x)))``
    pipelined over the ``axis`` dim of ``mesh``.

    ``body(stage_params, x_mb) -> y_mb`` must be shape-preserving.
    ``stacked_params`` leaves have leading dim S == mesh.shape[axis].
    ``x``'s batch dim must divide evenly into ``n_microbatches``.
    Returns the same result as the sequential composition (same dtype /
    shapes), computed with each stage resident on its own device slice.

    ``batch_axis``: mesh axis the batch dim stays sharded over — pp then
    composes with data parallelism (each (pp, data) device computes its
    stage on its local batch shard; ppermute moves activations along pp
    within a fixed data coordinate).
    """
    S = mesh.shape[axis]
    M = n_microbatches
    leading = {l.shape[0] for l in jax.tree_util.tree_leaves(stacked_params)}
    if leading != {S}:
        raise ValueError(
            f"stacked_params leading dims {leading} != pp axis size {S}"
        )
    if x.shape[0] % M:
        raise ValueError(f"batch {x.shape[0]} not divisible by {M} microbatches")
    mb = x.reshape(M, x.shape[0] // M, *x.shape[1:])

    perm = [(i, (i + 1) % S) for i in range(S)]

    def stage_fn(params_local, mb_all):
        # params_local: this stage's params with leading dim 1 -> squeeze
        params_local = jax.tree_util.tree_map(
            lambda l: l[0], params_local
        )
        idx = jax.lax.axis_index(axis)
        T = M + S - 1
        zero = jnp.zeros_like(mb_all[0])

        def tick(carry, t):
            incoming, outs = carry
            # stage 0 ingests microbatch t while filling; later stages
            # consume the ppermuted activation from the previous stage
            src = jnp.where(
                idx == 0,
                mb_all[jnp.clip(t, 0, M - 1)],
                incoming,
            )
            y = body(params_local, src)
            # only ticks where this stage holds a live microbatch matter;
            # dead ticks compute on garbage and are masked at write time
            live = (t - idx >= 0) & (t - idx < M)
            w = t - (S - 1)
            write = (idx == S - 1) & live
            outs = jax.lax.dynamic_update_index_in_dim(
                outs,
                jnp.where(write, y, outs[jnp.clip(w, 0, M - 1)]),
                jnp.clip(w, 0, M - 1),
                axis=0,
            )
            nxt = jax.lax.ppermute(y, axis, perm)
            return (nxt, outs), None

        # initial carry must be marked device-varying over the pp axis to
        # match the loop body's output type under shard_map's vma typing
        init = jax.lax.pvary((zero, jnp.zeros_like(mb_all)), (axis,))
        (_, outs), _ = jax.lax.scan(tick, init, jnp.arange(T))
        # every stage computed an `outs`, but only the last stage's is
        # real; psum after masking broadcasts it to all (cheap for demo
        # sizes; the caller keeps the first replica)
        outs = jnp.where(idx == S - 1, outs, jnp.zeros_like(outs))
        outs = jax.lax.psum(outs, axis)
        return outs

    mb_spec = P(None, batch_axis) if batch_axis else P()
    shard = partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), mb_spec),
        out_specs=mb_spec,
    )
    out = shard(stage_fn)(stacked_params, mb)
    return out.reshape(x.shape[0], *x.shape[1:])
