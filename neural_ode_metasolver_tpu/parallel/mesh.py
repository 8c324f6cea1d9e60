"""Device mesh + sharding: the distributed story the reference never had.

The reference is single-process single-GPU (SURVEY.md §2: no DDP/NCCL/MPI
anywhere); on TPU the equivalent capability is a ``jax.sharding.Mesh`` with
named axes and ``jit``-compiled collectives over ICI:

  * ``data`` axis  — batch-sharded data parallelism.  Params are replicated;
    XLA inserts the gradient all-reduce (psum) automatically because the
    replicated-param gradient of a data-sharded loss *is* a psum.
  * ``model`` axis — tensor parallelism over conv output channels / FC
    columns for the wide CIFAR variants; XLA partitions the convs and
    inserts all-gathers/reduce-scatters where layouts change.
  * ensemble members (solver/model ensembling, multi-seed sweeps) map onto
    extra mesh axes via vmap — see parallel/ensemble.py.

Everything works on any mesh shape, including a host-platform virtual mesh
(``--xla_force_host_platform_device_count=8``) for CI.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "initialize_distributed",
    "host_local_batch_to_global",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_params_tp",
    "shard_opt_state_tp",
    "make_parallel_train_step",
]


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Multi-host initialization (DCN) — call once per process before any
    device use.  On TPU pods with standard environments, all arguments are
    auto-detected; afterwards ``jax.devices()`` spans every host and
    ``make_mesh`` lays global meshes over ICI+DCN.  Single-host callers can
    skip this entirely."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def host_local_batch_to_global(batch, mesh: Mesh, axis: str = "data"):
    """Assemble a *globally* batch-sharded array from this process's local
    shard — the multi-host data-parallel feeding pattern.

    On a multi-host mesh each process loads only ``global_batch /
    num_processes`` examples (disjoint slices of the dataset); this stitches
    them into one global ``jax.Array`` sharded over ``axis`` without any
    cross-host transfer of examples (each device keeps its host's data).
    Single-process meshes degenerate to a plain sharded ``device_put``, so
    the same train loop runs unchanged from 1 chip to a pod.

    ``batch`` is a pytree of host arrays whose leading dim is the LOCAL
    batch; leaves are placed as ``P(axis)`` over the mesh.
    """
    def put(a):
        a = np.asarray(a)
        spec = P(axis, *([None] * (a.ndim - 1)))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), a
        )

    return jax.tree_util.tree_map(put, batch)


def make_mesh(
    axis_sizes: Dict[str, int], devices: Optional[Sequence] = None
) -> Mesh:
    """Build a mesh from ``{'data': n, 'model': m, ...}``; sizes must
    multiply to the device count (use -1 once for 'fill')."""
    devices = list(devices if devices is not None else jax.devices())
    names = list(axis_sizes.keys())
    sizes = list(axis_sizes.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = len(devices) // known
    if int(np.prod(sizes)) != len(devices):
        raise ValueError(
            f"mesh {dict(zip(names, sizes))} != {len(devices)} devices"
        )
    arr = np.asarray(devices).reshape(sizes)
    return Mesh(arr, names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Param leaf names this package's layers use (models/nn.py): "kernel" for
# conv/linear weights, "bias"/"scale" for additive/multiplicative 1-D
# channel params.  TP sharding is keyed on these names — NOT on bare shapes
# — so unrelated state that merely happens to be divisible never shards.
_TP_WEIGHT_NAMES = frozenset({"kernel"})
_TP_CHANNEL_NAMES = frozenset({"bias", "scale"})


def _leaf_key_name(path) -> str:
    """Final component of a tree path as a plain string."""
    if not path:
        return ""
    last = path[-1]
    if hasattr(last, "key"):
        return str(last.key)
    if hasattr(last, "name"):
        return str(last.name)
    if hasattr(last, "idx"):
        return str(last.idx)
    return str(last)


def _tp_spec_for(path, leaf, axis: str, size: int):
    """Tensor-parallel PartitionSpec for one *named* param leaf.

    Conv kernels (H, W, I, O) and linear kernels (I, O) shard the output
    dim; 1-D channel params (bias/scale) shard their only dim — each only
    when the leaf's tree-path name marks it a param of that kind AND the
    dim is divisible.  Everything else replicates.
    """
    name = _leaf_key_name(path)
    shp = getattr(leaf, "shape", ())
    if name in _TP_WEIGHT_NAMES:
        if len(shp) == 4 and shp[3] % size == 0:
            return P(None, None, None, axis)
        if len(shp) == 2 and shp[1] % size == 0:
            return P(None, axis)
    if name in _TP_CHANNEL_NAMES and len(shp) == 1 and shp[0] % size == 0:
        return P(axis)
    return P()


def shard_params_tp(params, mesh: Mesh, axis: str = "model"):
    """NamedSharding tree for tensor-parallel params over ``axis``.

    Returns a pytree of shardings matching ``params``; leaves whose
    tree-path name isn't a recognized param kind, or that can't be evenly
    split, are replicated.  Use with ``jax.device_put(params, shardings)``
    or as jit in_shardings.
    """
    size = mesh.shape[axis]
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, _tp_spec_for(path, leaf, axis, size)
        ),
        params,
    )


def shard_opt_state_tp(opt_state, params, mesh: Mesh, axis: str = "model"):
    """NamedSharding tree for optimizer state under tensor parallelism.

    Optimizer state mixes param-mirroring trees (momentum/``trace``, RMS
    ``nu``, MultiSteps ``acc_grads`` — each structurally identical to
    ``params``) with bookkeeping leaves (step counts, schedule state).
    Mirrors inherit the param shardings by *structure matching*; every
    other leaf replicates — no shape sniffing, so a bookkeeping vector
    that happens to be divisible is never silently sharded.
    """
    param_sh = shard_params_tp(params, mesh, axis)
    param_struct = jax.tree_util.tree_structure(params)
    repl = NamedSharding(mesh, P())

    def is_mirror(node):
        return jax.tree_util.tree_structure(node) == param_struct

    return jax.tree_util.tree_map(
        lambda node: param_sh if is_mirror(node) else repl,
        opt_state,
        is_leaf=is_mirror,
    )


def make_parallel_train_step(
    step_fn,
    mesh: Mesh,
    ts_template,
    *,
    data_axis: str = "data",
    model_axis: Optional[str] = None,
    spatial_axis: Optional[str] = None,
    donate: bool = False,
    compiler_options: Optional[dict] = None,
):
    """Wrap a ``step(ts, x, y, key) -> (ts, metrics)`` into a mesh-sharded jit.

    Batch is sharded over ``data_axis``; the TrainState params/opt-state are
    tensor-parallel over ``model_axis`` when given (else replicated); with
    ``spatial_axis``, the input's HEIGHT dim is additionally sharded — GSPMD
    partitions every conv spatially and inserts the halo exchanges for the
    3x3 windows itself (the TPU-native "sp" axis; useful when the per-device
    batch is already 1 and activations still don't fit).  The returned
    callable also returns sharded outputs so successive steps stay resident
    with no host round-trips.

    ``donate=True`` donates the TrainState argument (halves the
    train-state HBM footprint — important in exactly the too-big-to-fit
    regime sharding targets); leave False when the SAME state object is
    passed to multiple step calls (as the dryrun does).

    ``compiler_options`` forwards backend compiler flag overrides to the
    sharded jit (see ``make_train_step``) — the knob composes with mesh
    shardings unchanged.
    """
    if model_axis is not None:
        param_sh = shard_params_tp(ts_template.params, mesh, model_axis)
        opt_sh = shard_opt_state_tp(
            ts_template.opt_state, ts_template.params, mesh, model_axis
        )
        # start from an all-replicated sharding tree over WHATEVER fields
        # the state carries (TrainState, SolverTrainState, ...) and graft
        # the tp shardings in — replacing named fields one by one would
        # leave extra fields' template arrays inside in_shardings
        ts_sh = jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P()), ts_template
        )
        ts_sh = ts_sh.replace(params=param_sh, opt_state=opt_sh)
    else:
        ts_sh = jax.tree_util.tree_map(
            lambda _: replicated(mesh), ts_template
        )

    if spatial_axis is not None:
        x_sh = NamedSharding(mesh, P(data_axis, spatial_axis))
    else:
        x_sh = batch_sharding(mesh, data_axis)
    y_sh = batch_sharding(mesh, data_axis)
    key_sh = replicated(mesh)

    metrics_sh = replicated(mesh)

    return jax.jit(
        step_fn,
        in_shardings=(ts_sh, x_sh, y_sh, key_sh),
        out_shardings=(ts_sh, metrics_sh),
        donate_argnums=(0,) if donate else (),
        compiler_options=compiler_options,
    )
