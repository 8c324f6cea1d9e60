"""Robust-accuracy sweep CLI — parity with
odenet_mnist/attacks_runner.py + attacks_utils.py (run_attack).

Globs checkpoint directories, reconstructs model + solver from each saved
config (the reference rebuilds solvers from ``model_args.solvers[0]``,
attacks_runner.py:65), evaluates a (mode x epsilon) attack grid, and writes a
CSV of robust accuracies.

  python -m neural_ode_metasolver_tpu.runners.attacks_runner \
      --checkpoints_glob "./experiment_cifar/best_*" \
      --modes clean,fgsm,at --epsilons 0.01,0.03,0.1 --output_csv accs.csv
"""
from __future__ import annotations

import argparse
import csv
import glob
import os

import jax

from ..data import (
    CIFAR10_MEAN,
    CIFAR10_STD,
    batch_iterator,
    load_cifar10,
    load_mnist,
    synthetic_dataset,
)
from ..models.api import build_model
from ..ops import SolverOptions, parse_solver_dsl
from ..training import (
    AttackConfig,
    accuracy,
    accuracy_ensemble,
    adversarial_accuracy,
    adversarial_accuracy_ensemble,
    create_train_state,
    restore_checkpoint,
)
from ..utils import fix_seeds, get_logger


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoints_glob", type=str, required=True)
    p.add_argument("--modes", type=lambda s: s.split(","),
                   default=["clean", "fgsm", "at"])
    p.add_argument("--epsilons",
                   type=lambda s: [float(i) for i in s.split(",")],
                   default=[8 / 255])
    p.add_argument("--pgd_lr", type=float, default=2 / 255)
    p.add_argument("--pgd_niter", type=int, default=7)
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--max_batches", type=int, default=None,
                   help="cap eval batches (quick sweeps)")
    p.add_argument("--ensemble", action="store_true",
                   help="ALSO evaluate all matched checkpoints jointly as "
                        "a softmax-averaged model ensemble, attacked with "
                        "FGSM2Ensemble (reference run_attack2ensemble, "
                        "attacks_utils.py:68)")
    p.add_argument("--output_csv", type=str, default="robust_accuracy.csv")
    p.add_argument("--seed", type=int, default=502)
    return p.parse_args(argv)


def _rebuild(ckpt_dir):
    """Reconstruct (model, solvers, args) from a checkpoint's config."""
    import json

    with open(os.path.join(ckpt_dir, "config.json")) as f:
        cfg = json.load(f)
    # find the config inside the step dir if given a base dir
    return cfg


def _model_from_config(cfg):
    name = cfg["model"]
    margs = cfg.get("args", {})
    if name == "mnist":
        model = build_model(
            "mnist",
            downsampling_method=margs.get("downsampling_method", "conv"),
            is_odenet=margs.get("network", "odenet") == "odenet",
            in_channels=margs.get("in_channels", 1),
        )
        mean = std = None
        shape = (28, 28, 1)
    else:
        from .common import parse_num_blocks

        nb_override = {}
        if margs.get("num_blocks"):
            # runs trained with a --num_blocks registry override must be
            # rebuilt with the same stack or the param tree won't match
            nb_override["num_blocks"] = parse_num_blocks(margs["num_blocks"])
        model = build_model(
            name,
            is_odenet=margs.get("is_odenet", True),
            in_planes=margs.get("in_planes", 64),
            **nb_override,
            norms=(margs.get("normalization_resblock", "NF"),
                   margs.get("normalization_odeblock", "NF"),
                   margs.get("normalization_bn1", "NF")),
            num_gn_groups=margs.get("num_gn_groups", 32),
            param_norms=(margs.get("param_normalization_resblock", "PNF"),
                         margs.get("param_normalization_odeblock", "PNF"),
                         margs.get("param_normalization_bn1", "PNF")),
            acts=(margs.get("activation_resblock", "GeLU"),
                  margs.get("activation_odeblock", "GeLU"),
                  margs.get("activation_bn1", "GeLU")),
        )
        mean, std = CIFAR10_MEAN, CIFAR10_STD
        shape = (32, 32, 3)
    return model, mean, std, shape


def main(argv=None):
    args = parse_args(argv)
    key = fix_seeds(args.seed)
    logger = get_logger("attacks_runner.log", name="attacks")

    rows = []
    members_info = []  # (model_key, model, ts, solvers, opts, ds, mean, std)
    for base in sorted(glob.glob(args.checkpoints_glob)):
        # each checkpoint base dir holds step_XXXXXXXX subdirs
        step_dirs = sorted(glob.glob(os.path.join(base, "step_*")))
        if not step_dirs:
            continue
        cfg = _rebuild(step_dirs[-1])
        model, mean, std, shape = _model_from_config(cfg)
        solvers = parse_solver_dsl(cfg["solvers"])
        # the optimizer must match the saved opt-state structure
        # (reference analog: rebuilding from saved args, attacks_runner.py:65)
        margs = cfg.get("args", {})
        # the saved config determines the opt-state structure (cyclic
        # momentum wrapper, clipping, MultiSteps, nan_backoff) — one
        # shared reconstruction for every restore path
        from .common import optimizer_from_saved_args

        tx = optimizer_from_saved_args(margs)
        template = create_train_state(model, tx, jax.random.key(0))
        ts, _ = restore_checkpoint(base, template)

        if args.data_root:
            if cfg["model"] == "mnist":
                ds = load_mnist(args.data_root, train=False)
            else:
                ds = load_cifar10(args.data_root, train=False)
        else:
            ds = synthetic_dataset(1024, shape, seed=args.seed + 1)

        def data():
            it = batch_iterator(ds, args.batch_size, shuffle=False,
                                drop_last=False, mean=mean, std=std)
            if args.max_batches:
                import itertools

                it = itertools.islice(it, args.max_batches)
            return it

        # evaluate under the REGIME the checkpoint was trained/validated
        # with (reference rebuilds from saved model_args, attacks_runner.py:65)
        opts = SolverOptions(
            solver_mode=margs.get("solver_mode", "standalone"),
            switch_probs=margs.get("switch_probs"),
            ensemble_prob=margs.get("ensemble_prob", 1.0),
            ensemble_weights=margs.get("ensemble_weights"),
        )
        for mode in args.modes:
            for eps in args.epsilons:
                nonlocal_key = jax.random.fold_in(key, len(rows))
                if mode == "clean":
                    # switch/ensemble regimes need a PRNG key per batch
                    acc = accuracy(model, ts.params, ts.model_state,
                                   solvers, opts, data(),
                                   key=nonlocal_key)
                else:
                    acc = adversarial_accuracy(
                        model, ts.params, ts.model_state, solvers, opts,
                        data(),
                        AttackConfig(
                            mode="fgsm" if mode == "fgsm" else "at",
                            eps=eps, pgd_lr=args.pgd_lr,
                            pgd_niter=args.pgd_niter, mean=mean, std=std,
                        ),
                        nonlocal_key,
                    )
                logger.info(f"{base} | {mode} eps={eps:.4f} acc={acc:.4f}")
                rows.append({
                    "checkpoint": base, "mode": mode,
                    # clean rows carry no perturbation: recording the
                    # first sweep eps would mislabel them downstream
                    "eps": 0.0 if mode == "clean" else eps,
                    "accuracy": acc,
                })
                if mode == "clean":
                    break  # eps is irrelevant for clean
        # architecture fingerprint: ensembling shares one apply fn
        model_key = (cfg["model"],
                     tuple(sorted(
                         (k, str(v)) for k, v in margs.items()
                         if k in ("network", "in_planes", "in_channels",
                                  "downsampling_method", "num_blocks",
                                  "is_odenet",
                                  "normalization_resblock",
                                  "normalization_odeblock",
                                  "normalization_bn1",
                                  "param_normalization_resblock",
                                  "param_normalization_odeblock",
                                  "param_normalization_bn1",
                                  "activation",
                                  "activation_resblock",
                                  "activation_odeblock",
                                  "activation_bn1"))))
        members_info.append((model_key, model, ts, solvers, opts,
                             ds, mean, std))

    if args.ensemble:
        if len(members_info) < 2:
            logger.warning("--ensemble needs >= 2 matched checkpoints")
        elif len({mi[0] for mi in members_info}) != 1:
            logger.warning("--ensemble skipped: checkpoints mix "
                           "architectures")
        else:
            _, model, _, _, _, ds, mean, std = members_info[-1]
            members = [(mi[2].params, mi[2].model_state, mi[3], mi[4])
                       for mi in members_info]

            def ens_data():
                it = batch_iterator(ds, args.batch_size, shuffle=False,
                                    drop_last=False, mean=mean, std=std)
                if args.max_batches:
                    import itertools

                    it = itertools.islice(it, args.max_batches)
                return it

            tag = f"ENSEMBLE({len(members)})"
            k_ens = jax.random.fold_in(key, 99991)
            acc = accuracy_ensemble(model, members, ens_data(), key=k_ens)
            logger.info(f"{tag} | clean acc={acc:.4f}")
            rows.append({"checkpoint": tag, "mode": "ensemble_clean",
                         "eps": 0.0, "accuracy": acc})
            if any(m != "clean" for m in args.modes):
                for eps in args.epsilons:
                    k_ens = jax.random.fold_in(k_ens, 1)
                    adv = adversarial_accuracy_ensemble(
                        model, members, ens_data(),
                        AttackConfig(mode="fgsm", eps=eps,
                                     mean=mean, std=std),
                        k_ens,
                    )
                    logger.info(f"{tag} | fgsm2ensemble eps={eps:.4f} "
                                f"acc={adv:.4f}")
                    rows.append({"checkpoint": tag,
                                 "mode": "ensemble_fgsm", "eps": eps,
                                 "accuracy": adv})

    with open(args.output_csv, "w", newline="") as f:
        writer = csv.DictWriter(
            f, fieldnames=["checkpoint", "mode", "eps", "accuracy"]
        )
        writer.writeheader()
        writer.writerows(rows)
    logger.info(f"wrote {len(rows)} rows to {args.output_csv}")


if __name__ == "__main__":
    main()
