"""Shared runner engine: the epoch loop + multi-regime validation.

Functional re-design of ``odenet_mnist/train_validate.py`` (train :19,
validate :250, validate_standalone :118, validate_ensemble_switch :186) and
the inline loop of ``examples/cifar10/train_and_attack.py:511-564``:

  * per-iteration: one jitted train step (smoothing -> attack -> update)
  * per-epoch: for each mode in ``val_solver_modes`` —
      'standalone': per-solver accuracy, best checkpoint per solver id
      'switch'/'ensemble': single accuracy under that regime, best checkpoint
  * optional adversarial test accuracy (adv_testing_mode != clean)
  * orbax checkpoints carry the full TrainState + config (incl. the solver
    DSL string) so eval can reconstruct solvers like attacks_runner.py:65.
"""
from __future__ import annotations

import os
import time
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.api import Model
from ..ops import SolverOptions
from ..ops.solver import ParametricSolver
from ..training import (
    AttackConfig,
    LossConfig,
    NoiseConfig,
    TrainState,
    accuracy,
    adversarial_accuracy,
    create_train_state,
    make_train_step,
    nfe_per_forward,
    save_checkpoint,
    wait_for_checkpoints,
)

__all__ = [
    "fit",
    "validate",
    "bool_flag",
    "build_solver_options",
    "parse_mesh_spec",
    "parse_num_blocks",
    "optimizer_from_saved_args",
    "add_multihost_flags",
    "setup_multihost",
]


def add_multihost_flags(p):
    """Multi-host (DCN) flags shared by the training CLIs — the last seam
    of SURVEY.md §5's distributed mandate: ``initialize_distributed`` /
    ``host_local_batch_to_global`` were library-level and 2-process-tested
    (tests/test_parallel.py::test_two_process_distributed_*), these wire
    them to the runners so a pod slice needs no hand-written driver."""
    p.add_argument("--coordinator", type=str, default=None,
                   help="jax.distributed coordinator address "
                        "(host:port); with --num_hosts > 1, every "
                        "process passes the same value")
    p.add_argument("--num_hosts", type=int, default=None,
                   help="total number of processes in the multi-host "
                        "run (on TPU pods with standard envs this and "
                        "--process_id are auto-detected; pass "
                        "explicitly elsewhere)")
    p.add_argument("--process_id", type=int, default=None,
                   help="this process's rank in [0, num_hosts)")
    return p


def setup_multihost(args):
    """Initialize ``jax.distributed`` from the CLI flags.  MUST run before
    any device use (it changes what ``jax.devices()`` spans).  Returns
    this process's rank (0 when single-host)."""
    if not (args.coordinator or (args.num_hosts or 0) > 1
            or args.process_id is not None):
        return 0
    # Valid flag shapes: --coordinator alone (auto-detecting envs — TPU
    # pods/Slurm resolve num_processes/process_id themselves), or the
    # full triple.  Anything else hands None fields to
    # jax.distributed.initialize that off-pod hang waiting for
    # auto-detection or fail obscurely — reject with the missing flag
    # named.
    if args.coordinator is None:
        given = [n for n, v in (("--num_hosts", args.num_hosts),
                                ("--process_id", args.process_id))
                 if v is not None]
        raise ValueError(
            f"{' '.join(given)} given without --coordinator; pass "
            f"--coordinator too (auto-detecting TPU pod/Slurm envs), or "
            f"the full --coordinator/--num_hosts/--process_id triple")
    if (args.num_hosts is None) != (args.process_id is None):
        missing = ("--process_id" if args.process_id is None
                   else "--num_hosts")
        raise ValueError(
            f"--num_hosts/--process_id must be passed together "
            f"(or both omitted for auto-detection); missing: {missing}")
    from ..parallel import initialize_distributed

    if not getattr(args, "mesh", None):
        raise ValueError(
            "multi-host training needs --mesh (e.g. --mesh data=-1 to "
            "span every device of every host)")
    initialize_distributed(args.coordinator, args.num_hosts,
                           args.process_id)
    return jax.process_index()


def bool_flag(s: str) -> bool:
    """Boolean CLI operand in the reference's ``type=eval`` style
    (``--data_aug True`` — train_and_attack.py:40,87 etc.) without
    ``eval``'s failure modes: lowercase spellings parse too, and anything
    else is a clean argparse usage error instead of a NameError or an
    arbitrary-expression evaluation."""
    v = {"true": True, "false": False, "1": True, "0": False}.get(
        str(s).strip().lower()
    )
    if v is None:
        raise ValueError(f"expected True/False, got {s!r}")
    return v


def parse_num_blocks(nb):
    """``--num_blocks`` registry override → tuple-of-tuples.

    Accepts the CLI spec string ``"a,b;c,d"`` or an already-parsed
    sequence (as stored in checkpoint config sidecars). The ONE parser
    shared by the training CLI and every restore path — a format drift
    between them would rebuild a mismatched param tree at restore."""
    if isinstance(nb, str):
        try:
            parsed = tuple(
                tuple(int(v) for v in stage.split(","))
                for stage in nb.strip().split(";")
            )
        except ValueError:
            raise ValueError(
                f"--num_blocks: expected 'a,b;c,d' (ints, ';'-separated "
                f"(res, ode) stage pairs), got {nb!r}"
            ) from None
    else:
        parsed = tuple(tuple(int(v) for v in stage) for stage in nb)
    if not all(len(stage) == 2 for stage in parsed):
        raise ValueError(
            f"--num_blocks: every stage needs exactly (res, ode) — "
            f"got {nb!r}"
        )
    return parsed


def optimizer_from_saved_args(margs: dict):
    """Rebuild the optimizer a checkpoint was trained with from its saved
    config args — the ONE place that knows how flags map to the optax
    state layout, so every restore path (attacks_runner, the replication
    driver) produces a structure-matching template.

    Mirrors the runner wiring: coupled wd, grad clipping, zero_grad_every
    accumulation, nan_backoff wrapping, and cyclic momentum for
    sgd/rmsprop when the run had cycle_momentum (the lr value is
    irrelevant for the state structure; a constant stands in)."""
    from ..training import constant_lr, cyclic_momentum, make_optimizer

    momentum = margs.get("momentum", 0.9)
    if (margs.get("optim", "sgd") in ("sgd", "rmsprop")
            and margs.get("cycle_momentum", False)):
        momentum = cyclic_momentum(
            margs.get("step_size_up", 3186),
            margs.get("cyclic_lr_mode", "triangular2"),
            margs.get("base_momentum", 0.8),
            margs.get("max_momentum", 0.9),
        )
    return make_optimizer(
        margs.get("optim", "sgd"), constant_lr(0.1), momentum=momentum,
        weight_decay=margs.get("weight_decay", 0.0),
        grad_clip=margs.get("grad_clipping_threshold"),
        every_k=margs.get("zero_grad_every", 1),
        nonfinite_backoff=margs.get("nan_backoff"),
    )


def parse_mesh_spec(spec: Optional[str]) -> Optional[dict]:
    """Parse ``--mesh`` strings like ``"data=8"`` / ``"data=4,model=2"`` /
    ``"data=2,sp=2"`` into an axis-size dict (None/empty -> None).
    ``data`` is required; ``-1`` sizes mean "all remaining devices"
    (resolved by ``parallel.make_mesh``)."""
    if not spec:
        return None
    axes = {}
    known = ("data", "model", "sp", "pp")
    for part in spec.split(","):
        name, _, size = part.partition("=")
        name = name.strip()
        if not name or not size:
            raise ValueError(
                f"bad --mesh entry {part!r}; expected axis=size")
        if name not in known:
            # an unrecognized axis would silently replicate over its
            # devices (only these names are wired into the sharded step)
            raise ValueError(
                f"unknown mesh axis {name!r}; supported: {known}")
        n = int(size)
        if n < 1 and n != -1:
            raise ValueError(
                f"mesh axis {name!r} size must be >= 1 (or -1 for "
                f"'all remaining devices'), got {n}")
        axes[name] = n
    if "data" not in axes:
        raise ValueError(f"--mesh must include a data axis, got {spec!r}")
    return axes


def parse_compiler_options(pairs: Sequence[str]) -> Optional[dict]:
    """Parse repeated ``--compiler_option NAME=VALUE`` flags into the dict
    :func:`jax.jit` takes as ``compiler_options`` — backend compiler flag
    overrides (e.g. ``xla_tpu_scoped_vmem_limit_kib=65536``).  These reach
    the TPU compiler even through a remote-compile client where the
    ``XLA_FLAGS`` env var cannot (SCALING.md); unknown names fail the
    compile loudly rather than being ignored."""
    if not pairs:
        return None
    opts = {}
    for pair in pairs:
        name, sep, value = pair.partition("=")
        name, value = name.strip(), value.strip()
        if not name or not sep or not value:
            raise ValueError(
                f"bad --compiler_option {pair!r}; expected NAME=VALUE")
        # normalize boolean spellings: the local PJRT option parser
        # rejects lowercase "true"/"false" (and the remote tpu compile
        # helper rejects typed Python bools); the capitalized strings
        # "True"/"False" are accepted by BOTH parsers (measured,
        # SCALING.md / verify skill)
        if value.lower() in ("true", "false"):
            opts[name] = value.lower().capitalize()
        else:
            opts[name] = value
    return opts


def build_solver_options(args) -> SolverOptions:
    return SolverOptions(
        solver_mode=getattr(args, "solver_mode", "standalone"),
        switch_probs=getattr(args, "switch_probs", None),
        ensemble_prob=getattr(args, "ensemble_prob", 1.0),
        ensemble_weights=getattr(args, "ensemble_weights", None),
    )


def validate(
    model: Model,
    ts: TrainState,
    solvers: Sequence[ParametricSolver],
    args,
    eval_data_factory: Callable,
    key: jax.Array,
    logger,
    best: dict,
    save_dir: Optional[str],
    config: dict,
    epoch: int,
    predict_cache: Optional[dict] = None,
):
    """Run every requested validation mode; update ``best`` and write
    checkpoints on improvement (train_validate.py:250-342 semantics).

    ``predict_cache`` (dict, owned by the caller) reuses compiled eval steps
    across epochs instead of re-jitting each time.
    """
    from ..training import make_eval_step

    cache = predict_cache if predict_cache is not None else {}

    # Multi-host: the best-checkpoint saves below are orbax collectives
    # (every process must enter the barrier — fit's save discipline), so
    # the acc > best decision must be IDENTICAL on every process.  Local
    # eval accs should agree (replicated params, identically seeded data)
    # but are not guaranteed bitwise-equal across heterogeneous hosts;
    # broadcast rank 0's value so all ranks compare the same float.
    nproc = jax.process_count()

    def _sync(acc: float) -> float:
        if nproc == 1:
            return acc
        from jax.experimental import multihost_utils

        return float(multihost_utils.broadcast_one_to_all(
            np.float32(acc)))

    def get_predict(tag, solvers_, opts_):
        if tag not in cache:
            cache[tag] = make_eval_step(model, solvers_, opts_)
        return cache[tag]

    for mode in getattr(args, "val_solver_modes", ["standalone"]):
        if mode == "standalone":
            for i, s in enumerate(solvers):
                acc = accuracy(
                    model, ts.params, ts.model_state, [s],
                    SolverOptions(solver_mode="standalone"),
                    eval_data_factory(),
                    predict=get_predict(
                        f"standalone_{i}", [s],
                        SolverOptions(solver_mode="standalone"),
                    ),
                )
                acc = _sync(acc)
                logger.info(
                    f"epoch {epoch} | standalone solver {i} "
                    f"(u0={s.u0}) acc {acc:.4f}"
                )
                tag = f"standalone_{i}"
                if acc > best.get(tag, 0.0):
                    best[tag] = acc
                    if save_dir:
                        save_checkpoint(
                            os.path.join(save_dir, f"best_solver_{i}"),
                            ts, {**config, "val_acc": acc, "solver_id": i},
                            block=False,
                        )
        elif mode in ("switch", "ensemble"):
            opts = SolverOptions(
                solver_mode=mode,
                switch_probs=getattr(args, "switch_probs", None),
                ensemble_prob=getattr(args, "ensemble_prob", 1.0),
                ensemble_weights=getattr(args, "ensemble_weights", None),
            )
            key, sub = jax.random.split(key)
            acc = accuracy(
                model, ts.params, ts.model_state, solvers, opts,
                eval_data_factory(), key=sub,
                predict=get_predict(mode, solvers, opts),
            )
            acc = _sync(acc)
            logger.info(f"epoch {epoch} | {mode} acc {acc:.4f}")
            if acc > best.get(mode, 0.0):
                best[mode] = acc
                if save_dir:
                    save_checkpoint(
                        os.path.join(save_dir, f"best_{mode}"),
                        ts, {**config, "val_acc": acc},
                        block=False,
                    )
        else:
            raise ValueError(f"unknown val solver mode {mode!r}")
    return best


def fit(
    model: Model,
    solvers: Sequence[ParametricSolver],
    tx,
    args,
    logger,
    train_data_factory: Callable,  # (epoch) -> iterator of (x, y)
    eval_data_factory: Callable,  # () -> iterator
    test_data_factory: Optional[Callable] = None,
    config: Optional[dict] = None,
) -> TrainState:
    """The end-to-end training driver shared by the MNIST/CIFAR CLIs."""
    key = jax.random.key(getattr(args, "seed", 502))
    key, k_init = jax.random.split(key)
    ts = create_train_state(model, tx, k_init)

    # Resume from the rolling 'last' checkpoint when requested (the resume
    # path the reference never wired — SURVEY.md §5 checkpoint/resume gap).
    save_dir = getattr(args, "save_dir", None)
    if getattr(args, "resume", False) and save_dir:
        from ..training import restore_checkpoint

        last_dir = os.path.join(save_dir, "last")
        try:
            ts, _ = restore_checkpoint(last_dir, ts)
            logger.info(f"resumed from {last_dir} at step {int(ts.step)}")
        except FileNotFoundError:
            logger.info("no checkpoint to resume from; starting fresh")

    solver_options = build_solver_options(args)
    attack_cfg = AttackConfig(
        mode=getattr(args, "adv_training_mode", "clean"),
        eps=getattr(args, "eps_adv_training", 8 / 255),
        alpha=getattr(args, "fgsm_random_step_size_training", 10 / 255),
        pgd_lr=getattr(args, "pgd_lr_training", 2 / 255),
        pgd_niter=getattr(args, "pgd_niter_training", 7),
        mean=getattr(args, "data_mean", None),
        std=getattr(args, "data_std", None),
    )
    noise_cfg = NoiseConfig(
        noise_type=getattr(args, "noise_type", None),
        sigma=getattr(args, "noise_sigma", 0.001),
        prob=getattr(args, "noise_prob", 0.0),
        minimize_rk2_error=getattr(args, "minimize_rk2_error", False),
    )
    loss_cfg = LossConfig(
        ss_loss=getattr(args, "ss_loss", False),
        ss_loss_reg=getattr(args, "ss_loss_reg", 0.1),
        data_noise_std=getattr(args, "data_noise_std", 0.0),
    )
    compute_dtype = (
        jnp.bfloat16 if getattr(args, "precision", "f32") == "bf16" else None
    )
    mesh_spec = parse_mesh_spec(getattr(args, "mesh", None))
    mesh = None
    if mesh_spec:
        from ..parallel import make_mesh

        sizes = list(mesh_spec.values())
        devices = None
        if -1 not in sizes:
            want = int(np.prod(sizes))
            if want < len(jax.devices()):
                # an explicit spec smaller than the host takes a device
                # prefix (e.g. --mesh data=4 on an 8-device pod slice)
                devices = jax.devices()[:want]
        mesh = make_mesh(mesh_spec, devices)
        logger.info(f"mesh: {dict(mesh.shape)} over {mesh.size} devices")
        if getattr(args, "batch_size", 0) % mesh.shape["data"]:
            raise ValueError(
                f"batch_size {args.batch_size} must be divisible by the "
                f"data axis size ({mesh.shape['data']})"
            )
        if "pp" in mesh_spec:
            # rebuild the model so same-shape ODE-block stacks route
            # through the GPipe combinator over the pp axis (layers whose
            # block count doesn't divide the stage count, and the
            # ss-loss/adjoint paths, fall back to the sequential loop)
            from ..models.api import make_cifar_model
            from ..parallel import PipelineConfig

            if not hasattr(model.cfg, "num_blocks"):
                raise ValueError(
                    "--mesh pp= needs a cifar-family model (stacked "
                    "same-shape ODE blocks); the MNIST net has one block"
                )
            mb = getattr(args, "pp_microbatches", 0)
            pcfg = PipelineConfig(
                mesh=mesh, axis="pp", n_microbatches=mb, batch_axis="data"
            )
            per_mb = getattr(args, "batch_size", 0) // pcfg.microbatches
            if (getattr(args, "batch_size", 0) % pcfg.microbatches
                    or per_mb % mesh.shape["data"]):
                raise ValueError(
                    f"batch_size {args.batch_size} must split into "
                    f"{pcfg.microbatches} microbatches each divisible by "
                    f"the data axis size ({mesh.shape['data']})"
                )
            if not any(
                n_ode > 1 and n_ode % pcfg.stages == 0
                for _, n_ode in model.cfg.num_blocks
            ):
                logger.warning(
                    f"--mesh pp={pcfg.stages}: no layer in "
                    f"num_blocks={list(model.cfg.num_blocks)} has an "
                    f"ODE-block stack divisible into {pcfg.stages} stages; "
                    "the pp devices are reserved but every layer runs "
                    "sequentially (use --num_blocks to deepen the stacks, "
                    "e.g. premetanode18/34)"
                )
            model = make_cifar_model(model.cfg, pipeline=pcfg)
    copts = parse_compiler_options(
        getattr(args, "compiler_option", None) or []
    )
    step = make_train_step(
        model, tx, solvers, solver_options, attack_cfg, noise_cfg, loss_cfg,
        compute_dtype=compute_dtype,
        skip_nonfinite=getattr(args, "skip_nonfinite", False),
        unroll=getattr(args, "unroll", 1),
        integration_method=getattr(args, "integration_method", "backprop"),
        # the mesh path re-jits with explicit shardings below
        jit_compile=mesh_spec is None,
        donate=mesh_spec is None,
        compiler_options=copts if mesh_spec is None else None,
    )
    # Multi-host (DCN): every process runs this same fit() in lockstep;
    # rank r feeds its disjoint 1/nproc slice of each (identically
    # seeded, hence identically ordered) global batch through
    # host_local_batch_to_global, so the jitted step sees the SAME
    # global batch as a single-process run — loss/params parity is
    # asserted by tests/test_parallel.py::test_runner_cli_two_process_*.
    nproc = jax.process_count()
    multihost = nproc > 1
    rank = jax.process_index()
    if multihost:
        if mesh is None:
            raise ValueError(
                "multi-host training needs --mesh (e.g. data=-1)")
        if any(ax != "data" for ax in mesh_spec):
            raise ValueError(
                "multi-host runners shard the data axis only; model/sp/pp "
                "meshes are single-host (their param/halo placements are "
                "not wired through host_local_batch_to_global)")
        if getattr(args, "batch_size", 0) % nproc:
            raise ValueError(
                f"batch_size {args.batch_size} must be divisible by the "
                f"process count ({nproc})")
    batch_sh = None
    if mesh_spec:
        from ..parallel import (
            batch_sharding,
            make_parallel_train_step,
        )

        step = make_parallel_train_step(
            step, mesh, ts, data_axis="data",
            model_axis="model" if "model" in mesh_spec else None,
            spatial_axis="sp" if "sp" in mesh_spec else None,
            donate=True,
            compiler_options=copts,
        )
        if multihost:
            # the fresh TrainState is committed to this process's local
            # device 0; jit in_shardings cannot reshard committed arrays
            # across hosts — place it replicated over the global mesh
            # explicitly (the _distributed_worker pattern)
            from jax.sharding import NamedSharding, PartitionSpec as P

            ts = jax.device_put(
                ts, jax.tree_util.tree_map(
                    lambda _: NamedSharding(mesh, P()), ts)
            )
        # prefetch placement must match the step's in_shardings exactly
        # (jit rejects committed args with a different sharding); under
        # sp the input x is P('data','sp') while labels stay P('data')
        if "sp" in mesh_spec:
            from jax.sharding import NamedSharding, PartitionSpec as P

            batch_sh = (NamedSharding(mesh, P("data", "sp")),
                        batch_sharding(mesh))
        else:
            batch_sh = batch_sharding(mesh)
    config = dict(config or {})
    logger.info(
        "NFE/forward: %s",
        nfe_per_forward(solvers, solver_options, _count_ode_blocks(model)),
    )

    best: dict = {}
    predict_cache: dict = {}
    from ..data.prefetch import prefetch_to_device
    from ..training.logging import MetricsLogger

    prefetch = getattr(args, "prefetch", 2)
    # multi-host: EVERY process calls the checkpoint saves below (orbax
    # coordinates internally — the primary host writes, all participate
    # in its barriers; a rank-gated save would deadlock the others), but
    # only rank 0 appends to the metrics JSONL (plain file, no barrier)
    mlog = (MetricsLogger(save_dir, config=config)
            if save_dir and rank == 0 else None)
    profile_dir = getattr(args, "profile_dir", None)
    profiling = False
    for epoch in range(getattr(args, "nepochs", 1)):
        # Throughput discipline: batches are device_put ahead of the step
        # (upload rides under compute) and per-step metrics stay on device
        # until the epoch ends — a float() per step would block dispatch
        # pipelining (SCALING.md timing methodology).
        batches = train_data_factory(epoch)
        if multihost:
            # per-process slice -> global assembly (replaces the sharded
            # prefetch: device_put cannot target non-addressable devices,
            # make_array_from_process_local_data can).  threaded_iterator
            # keeps the overlap prefetch_to_device would have given: the
            # factory's augmentation + assembly dispatch run off-thread.
            batches = _multihost_batches(batches, mesh, nproc, rank)
            if prefetch:
                from ..data.prefetch import threaded_iterator

                batches = threaded_iterator(batches, size=prefetch)
        elif prefetch:
            # threaded producer: numpy augmentation + upload dispatch run
            # off-thread, overlapping the previous step's device compute;
            # under --mesh, batches land already data-sharded over it
            batches = prefetch_to_device(batches, size=prefetch,
                                         sharding=batch_sh, thread=True)
        losses = []
        skipped = []
        n_batches = 0
        t_epoch = time.perf_counter()
        try:
            for x, y in batches:
                key, sub = jax.random.split(key)
                ts, m = step(ts, jnp.asarray(x), jnp.asarray(y), sub)
                losses.append(m["loss"])
                if "skipped_nonfinite" in m:
                    skipped.append(m["skipped_nonfinite"])
                n_batches += 1
                if profile_dir and epoch == 0:
                    # TensorBoard-loadable device trace of steady-state
                    # steps 1-3 (step 0 is the compile; tracing it would
                    # swamp the timeline) — SURVEY.md §5 tracing/profiling
                    if n_batches == 1:
                        jax.block_until_ready(m["loss"])
                        jax.profiler.start_trace(profile_dir)
                        profiling = True
                    elif n_batches == 4 and profiling:
                        jax.block_until_ready(m["loss"])
                        jax.profiler.stop_trace()
                        profiling = False
                        logger.info(f"profiler trace (steps 1-3) in "
                                    f"{profile_dir}")
        finally:
            if profiling:
                # short epoch (<4 batches) OR an exception mid-window:
                # flush whatever was captured — on a crash the partial
                # trace is exactly the artifact worth keeping
                if losses:
                    jax.block_until_ready(losses[-1])
                jax.profiler.stop_trace()
                profiling = False
                logger.info(f"profiler trace in {profile_dir}")
        losses = [float(v) for v in jax.device_get(losses)]  # drains the queue
        skipped = float(np.sum(jax.device_get(skipped))) if skipped else 0.0
        if not n_batches:
            # drop_last batching yields nothing when the dataset is smaller
            # than the batch size; `m` is undefined and mean([]) is nan —
            # warn instead of logging garbage / crashing
            logger.warning(
                f"epoch {epoch}: no training batches "
                f"(dataset smaller than batch_size with drop_last?)"
            )
        else:
            # raw per-epoch average — the meter only sees one sample per
            # epoch now, so its 0.99-EMA would stay pinned to epoch 0's
            # compile time for the whole run
            epoch_bt = (time.perf_counter() - t_epoch) / n_batches
            logger.info(
                f"epoch {epoch} | train loss {np.mean(losses):.4f} | "
                f"batch time {epoch_bt:.3f}s"
                + (f" | skipped_nonfinite {skipped:.0f}" if skipped else "")
            )
            if mlog:
                mlog.log(
                    {"epoch": epoch, "train_loss": float(np.mean(losses)),
                     "batch_time": epoch_bt, **{
                         k: float(v) for k, v in m.items()},
                     "epoch_skipped_nonfinite": skipped},
                    step=int(ts.step),
                )
        key, k_val = jax.random.split(key)
        # under multi-host the TrainState lives replicated on the global
        # mesh; eval/checkpointing run per-process on local devices, so
        # hand them a host copy (params are replicated — every process
        # holds the full values)
        eval_ts = jax.device_get(ts) if multihost else ts
        best = validate(
            model, eval_ts, solvers, args, eval_data_factory, k_val, logger,
            best, save_dir, config, epoch, predict_cache=predict_cache,
        )
        if mlog and best:
            # per-epoch best-so-far accuracies in the JSONL stream, so a
            # run that dies before the final summary line still leaves
            # its comparison data (consumed by runners/sweep._best_metric)
            mlog.log(
                {"epoch": epoch,
                 **{f"best_{tag}": float(v) for tag, v in best.items()}},
                step=int(ts.step),
            )
        adv_mode = getattr(args, "adv_testing_mode", "clean")
        if adv_mode != "clean" and test_data_factory is not None:
            key, k_adv = jax.random.split(key)
            test_attack = AttackConfig(
                mode="fgsm" if adv_mode == "fgsm" else "at",
                eps=getattr(args, "eps_adv_testing", 8 / 255),
                pgd_lr=getattr(args, "pgd_lr_testing", 2 / 255),
                pgd_niter=getattr(args, "pgd_niter_testing", 7),
                mean=getattr(args, "data_mean", None),
                std=getattr(args, "data_std", None),
            )
            if "adv_predict" not in predict_cache:
                from ..training import make_adversarial_predict

                predict_cache["adv_predict"] = make_adversarial_predict(
                    model, solvers, solver_options, test_attack,
                    remat=getattr(args, "remat", False),
                    unroll=getattr(args, "unroll", 1),
                )
            adv_acc = adversarial_accuracy(
                model, eval_ts.params, eval_ts.model_state, solvers,
                solver_options, test_data_factory(), test_attack, k_adv,
                predict=predict_cache["adv_predict"],
            )
            logger.info(f"epoch {epoch} | adversarial test acc {adv_acc:.4f}")
            if mlog:
                mlog.log({"epoch": epoch, "adv_test_acc": adv_acc},
                         step=int(ts.step))
        if save_dir:
            # async: serialization/IO overlaps the next epoch's compute
            # (under multi-host the checkpoint layer forces sync saves —
            # async commit barriers would race across processes)
            save_checkpoint(os.path.join(save_dir, "last"), eval_ts,
                            config, block=False)
    if save_dir:
        wait_for_checkpoints()
    if mlog:
        mlog.log({"best": max(best.values()) if best else 0.0},
                 step=int(ts.step))
        mlog.close()
    return ts


def _multihost_batches(batches, mesh, nproc: int, rank: int):
    """Slice each (identically ordered) global batch to this process's
    1/nproc shard and assemble the global sharded arrays — the
    ``host_local_batch_to_global`` feeding pattern, inline in the epoch
    loop.  Every process iterates the same seeded batch stream, so the
    slices are disjoint and together reconstitute the exact single-process
    batch (cross-host transfer: none; each device keeps its host's data).

    Every process materializes + augments the full global batch before
    slicing — nproc-fold redundant host work, accepted deliberately: the
    identical streams are what guarantee single-process parity without
    cross-host data exchange, and the redundant numpy work rides on the
    background thread (threaded_iterator in fit).  A pod-scale input
    pipeline would shard the dataset per process instead."""
    from ..parallel import host_local_batch_to_global

    for x, y in batches:
        x, y = np.asarray(x), np.asarray(y)
        if x.shape[0] % nproc:
            raise ValueError(
                f"multi-host batch of {x.shape[0]} is not divisible by "
                f"the process count ({nproc}); use drop_last batching or "
                f"a batch_size that is a multiple of the process count — "
                f"silently truncating would break single-process parity")
        per = x.shape[0] // nproc
        yield host_local_batch_to_global(
            (x[rank * per:(rank + 1) * per],
             y[rank * per:(rank + 1) * per]),
            mesh,
        )


def _count_ode_blocks(model: Model) -> int:
    cfg = model.cfg
    if hasattr(cfg, "num_blocks"):
        return sum(n_ode for _, n_ode in cfg.num_blocks)
    return 1 if getattr(cfg, "is_odenet", True) else 0
