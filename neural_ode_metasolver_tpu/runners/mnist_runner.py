"""MNIST training CLI — flag parity with odenet_mnist/runner_new.py.

Example:
  python -m neural_ode_metasolver_tpu.runners.mnist_runner \
      --solvers "rk2,u,8,-1,0.5,-1" --nepochs 3 --batch_size 128 \
      --data_root /path/to/mnist   # or omit for synthetic data
"""
from __future__ import annotations

import argparse
import os

import jax

from ..data import (
    batch_iterator,
    load_mnist,
    synthetic_dataset,
)
from ..models.api import build_model
from ..ops import parse_solver_dsl
from ..training import learning_rate_with_decay, make_optimizer
from ..utils import count_parameters, fix_seeds, get_logger
from .common import add_multihost_flags, bool_flag, fit, setup_multihost


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    # solver / regime flags (runner.py:31-53)
    p.add_argument("--solvers", type=str, default="rk2,u,8,-1,0.5,-1")
    p.add_argument("--solver_mode", type=str, default="standalone",
                   choices=["standalone", "switch", "ensemble"])
    p.add_argument("--switch_probs",
                   type=lambda s: [float(i) for i in s.split(",")],
                   default=None)
    p.add_argument("--ensemble_weights",
                   type=lambda s: [float(i) for i in s.split(",")],
                   default=None)
    p.add_argument("--ensemble_prob", type=float, default=1.0)
    p.add_argument("--noise_type", type=str, default=None,
                   choices=[None, "cauchy", "normal"])
    p.add_argument("--noise_sigma", type=float, default=0.001)
    p.add_argument("--noise_prob", type=float, default=0.0)
    p.add_argument("--minimize_rk2_error", action="store_true")
    p.add_argument("--val_solver_modes",
                   type=lambda s: s.strip().split(","),
                   default=["standalone"])
    # architecture (runner.py:55-66)
    p.add_argument("--network", type=str, default="odenet",
                   choices=["odenet", "resnet"])
    p.add_argument("--downsampling_method", type=str, default="conv",
                   choices=["conv", "res"])
    p.add_argument("--activation", type=str, default="relu")
    p.add_argument("--in_channels", type=int, default=1)
    # optimization (runner.py:137-151)
    p.add_argument("--lr", type=float, default=0.1)
    p.add_argument("--optim", type=str, default="rmsprop",
                   choices=["sgd", "rmsprop", "adam"])
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--weight_decay", type=float, default=0.0005)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--test_batch_size", type=int, default=1000)
    p.add_argument("--nepochs", type=int, default=160)
    p.add_argument("--data_aug", type=bool_flag, default=True,
                   choices=[True, False])
    p.add_argument("--seed", type=int, default=502)
    # adversarial training/testing (runner_new.py:86-104)
    p.add_argument("--adv_training_mode", default="clean",
                   choices=["clean", "fgsm", "at"])
    p.add_argument("--eps_adv_training", type=float, default=0.3)
    p.add_argument("--pgd_lr_training", type=float, default=2 / 255)
    p.add_argument("--pgd_niter_training", type=int, default=7)
    p.add_argument("--adv_testing_mode", default="clean",
                   choices=["clean", "fgsm", "at"])
    p.add_argument("--eps_adv_testing", type=float, default=0.3)
    p.add_argument("--pgd_lr_testing", type=float, default=2 / 255)
    p.add_argument("--pgd_niter_testing", type=int, default=7)
    p.add_argument("--ss_loss", action="store_true")
    p.add_argument("--ss_loss_reg", type=float, default=0.1)
    p.add_argument("--data_noise_std", type=float, default=0.0)
    # io
    p.add_argument("--dataset", type=str, default="mnist",
                   choices=["mnist", "svhn"],
                   help="train/eval dataset (svhn = the reference's "
                        "get_svhn_loaders path: 32x32 RGB cropped digits)")
    p.add_argument("--download", action="store_true",
                   help="fetch the dataset into --data_root (default data/) "
                        "if missing — the torchvision download=True analog")
    p.add_argument("--data_root", type=str, default=None,
                   help="dir with MNIST IDX files; fallback data if unset")
    p.add_argument("--fallback_dataset", type=str, default="synthetic",
                   choices=["synthetic", "digits"],
                   help="without --data_root: synthetic blobs or sklearn's "
                        "real handwritten digits (offline)")
    p.add_argument("--save_dir", type=str, default="./experiment_mnist")
    p.add_argument("--debug", action="store_true")
    p.add_argument("--resume", action="store_true")
    # trainable solver coefficients (reference legacy lr_uv param group,
    # runner_old.py:184-185)
    p.add_argument("--train_solver_params", action="store_true",
                   help="optimize solver u/v jointly with the network")
    p.add_argument("--lr_uv", type=float, default=0.01,
                   help="learning rate for the solver-parameter group")
    p.add_argument("--integration_method", type=str, default="backprop",
                   choices=["backprop", "adjoint"],
                   help="gradient path through the ODE solve: exact "
                   "backprop-through-scan, or the continuous adjoint "
                   "(checkpointed, O(n_steps)-state instead of full "
                   "activations; runner_old.py analog)")
    p.add_argument("--nan_backoff", type=float, default=None,
                   help="on non-finite grads: drop the update and dip the "
                   "effective step size by this factor (recovers over "
                   "subsequent finite steps)")
    p.add_argument("--skip_nonfinite", action="store_true",
                   help="skip (not apply) updates with non-finite loss/grads; logs skipped_nonfinite metric")
    p.add_argument("--unroll", type=int, default=1,
                   help="ODE scan unroll factor (8 = fully unroll the flagship 8-step solve; ~+10%% bf16 / +40%% f32 on v5e)")
    p.add_argument("--precision", type=str, default="f32",
                   choices=["f32", "bf16"],
                   help="compute precision (bf16 = mixed precision, the "
                        "apex-O1 analog; master params stay f32)")
    p.add_argument("--mesh", type=str, default=None,
                   help="multi-chip training: axis spec like 'data=8' or "
                        "'data=4,model=2' (tp) or 'data=2,sp=2' (spatial); "
                        "shards the jitted step over a jax.sharding.Mesh")
    p.add_argument("--compiler_option", action="append", default=None,
                   metavar="NAME=VALUE",
                   help="backend compiler flag override for the jitted "
                        "step (repeatable), e.g. "
                        "xla_tpu_scoped_vmem_limit_kib=65536; reaches the "
                        "TPU compiler even where XLA_FLAGS cannot "
                        "(SCALING.md)")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="capture a TensorBoard device trace of "
                        "steady-state steps 1-3 (epoch 0) into this dir")
    p.add_argument("--prefetch", type=int, default=2,
                   help="batches to device_put ahead of the train step "
                        "(0 disables; overlaps upload with compute)")
    p.add_argument("--synthetic_train_size", type=int, default=4096)
    p.add_argument("--synthetic_test_size", type=int, default=1024)
    add_multihost_flags(p)
    return p


def parse_args(argv=None):
    return build_parser().parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    rank = setup_multihost(args)  # before ANY device use
    fix_seeds(args.seed)
    logger = get_logger(
        os.path.join(args.save_dir,
                     "logs" if rank == 0 else f"logs_p{rank}"),
        debug=args.debug, name="mnist",
    )
    logger.info(str(vars(args)))

    if args.dataset == "svhn" and args.in_channels == 1:
        # SVHN is 32x32 RGB (reference get_svhn_loaders,
        # odenet_mnist/data.py:39-69); widen the stem unless overridden
        args.in_channels = 3
        logger.info("svhn: in_channels -> 3")
    image_shape = (28, 28, 1) if args.dataset == "mnist" else (32, 32, 3)

    solvers = parse_solver_dsl(args.solvers)
    model = build_model(
        "mnist",
        downsampling_method=args.downsampling_method,
        is_odenet=args.network == "odenet",
        activation_type=args.activation,
        in_channels=args.in_channels,
    )
    params, _ = model.init(jax.random.key(0))
    logger.info(f"Number of parameters: {count_parameters(params)}")

    if getattr(args, "download", False):
        from ..data.download import ensure_dataset

        fetched = ensure_dataset(args.dataset, args.data_root)
        if fetched:
            args.data_root = fetched
    if args.data_root:
        if args.dataset == "svhn":
            from ..data import load_svhn

            train_ds = load_svhn(args.data_root, split="train")
            test_ds = load_svhn(args.data_root, split="test")
        else:
            train_ds = load_mnist(args.data_root, train=True)
            test_ds = load_mnist(args.data_root, train=False)
    elif args.fallback_dataset == "digits" and args.dataset == "mnist":
        from ..data import load_digits_dataset

        logger.warning("no --data_root: using sklearn handwritten digits")
        train_ds, test_ds = load_digits_dataset(seed=args.seed)
    else:
        logger.warning("no --data_root: falling back to synthetic data")
        train_ds = synthetic_dataset(args.synthetic_train_size, image_shape,
                                     seed=args.seed)
        test_ds = synthetic_dataset(args.synthetic_test_size, image_shape,
                                    seed=args.seed + 1)

    crop = 4 if args.data_aug else 0

    def train_data(epoch):
        return batch_iterator(
            train_ds, args.batch_size, seed=args.seed + epoch,
            crop_padding=crop,
        )

    def eval_data():
        # keep the tail batch: eval must cover every sample (the digits
        # fallback's 359-sample test set yields ZERO batches under
        # drop_last; reference MNIST accuracy divides by len(dataset))
        return batch_iterator(
            test_ds, args.test_batch_size, shuffle=False, drop_last=False
        )

    batches_per_epoch = len(train_ds) // args.batch_size
    sched = learning_rate_with_decay(
        args.lr, args.batch_size, batches_per_epoch,
        boundary_epochs=[60, 100, 140],
        decay_rates=[1, 0.1, 0.01, 0.001],
    )
    tx = make_optimizer(args.optim, sched, momentum=args.momentum,
                        weight_decay=args.weight_decay,
                        nonfinite_backoff=args.nan_backoff)

    config = {"args": vars(args), "solvers": args.solvers, "model": "mnist"}
    if args.train_solver_params:
        if getattr(args, "mesh", None):
            raise ValueError(
                "--mesh is not supported with --train_solver_params "
                "(the joint solver-parameter loop is single-device)")
        if args.integration_method != "backprop":
            raise ValueError(
                "--train_solver_params needs discretize-then-optimize "
                "gradients (the continuous adjoint treats the tableau as "
                "the integration method — u/v get no gradient; "
                "ops/adjoint.py docstring)")
        if getattr(args, "profile_dir", None):
            raise ValueError(
                "--profile_dir is not supported with --train_solver_params "
                "(the joint solver-parameter loop has no trace window); "
                "profile the frozen-solver step instead")
        _fit_with_trainable_solvers(model, solvers, tx, args, logger,
                                    train_data, eval_data, config)
    else:
        fit(model, solvers, tx, args, logger, train_data, eval_data,
            test_data_factory=eval_data, config=config)


def _fit_with_trainable_solvers(model, solvers, tx, args, logger,
                                train_data, eval_data, config):
    """Joint (network, solver u/v) optimization loop — the runner_old lr_uv
    capability, on the modern stack."""
    import os

    import numpy as np

    from ..training import (
        AttackConfig,
        accuracy,
        create_solver_train_state,
        make_optimizer,
        make_solver_train_step,
        save_checkpoint,
        solvers_from_state,
    )
    from .common import build_solver_options

    solver_tx = make_optimizer("sgd", args.lr_uv)
    opts = build_solver_options(args)
    attack_cfg = AttackConfig(
        mode=args.adv_training_mode, eps=args.eps_adv_training,
        pgd_lr=args.pgd_lr_training, pgd_niter=args.pgd_niter_training,
    )
    step = make_solver_train_step(model, tx, solver_tx, solvers, opts,
                                  attack_cfg=attack_cfg)
    key = jax.random.key(args.seed)
    key, k_init = jax.random.split(key)
    ts = create_solver_train_state(model, tx, solver_tx, solvers, k_init)
    from ..training.logging import MetricsLogger

    mlog = MetricsLogger(args.save_dir, config=config) if args.save_dir \
        else None
    import jax.numpy as jnp

    for epoch in range(args.nepochs):
        losses = []
        for x, y in train_data(epoch):
            key, sub = jax.random.split(key)
            ts, m = step(ts, jnp.asarray(x), jnp.asarray(y), sub)
            # keep the device scalar: a float() per step would block
            # dispatch pipelining (same discipline as common.fit)
            losses.append(m["loss"])
        losses = [float(v) for v in jax.device_get(losses)]
        cur = solvers_from_state(solvers, ts.solver_params)
        key, k_val = jax.random.split(key)
        # switch/ensemble eval regimes need the key; harmless otherwise
        acc = accuracy(model, ts.params, ts.model_state, cur, opts,
                       eval_data(), key=k_val)
        us = [f"{float(s.u):.4f}" if s.u is not None else "-" for s in cur]
        logger.info(
            f"epoch {epoch} | loss {np.mean(losses):.4f} | acc {acc:.4f} | "
            f"u = {us}"
        )
        if mlog:
            rec = {"epoch": epoch, "train_loss": float(np.mean(losses)),
                   "accuracy": float(acc)}
            for i, s in enumerate(cur):
                if s.u is not None:
                    rec[f"solver{i}_u"] = float(s.u)
                if s.v is not None:
                    rec[f"solver{i}_v"] = float(s.v)
            mlog.log(rec, step=int(ts.step))
    if mlog:
        mlog.close()  # release metrics.jsonl / finish wandb, like fit()
    if args.save_dir:
        save_checkpoint(os.path.join(args.save_dir, "solver_trained"), ts,
                        config)
    return ts


if __name__ == "__main__":
    main()
