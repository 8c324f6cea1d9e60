"""CIFAR-10 train+attack CLI — flag parity with
examples/cifar10/train_and_attack.py (the flagship experiment driver).

Flagship reproduction:
  python -m neural_ode_metasolver_tpu.runners.cifar_runner \
      --network premetanode10 --solvers "rk2,u,8,-1,0.5,-1" \
      --adv_training_mode fgsm_random --noise_type normal \
      --noise_sigma 0.0125 --noise_prob 1.0 --nepochs 36 \
      --data_root /path/to/cifar   # or omit for synthetic data
"""
from __future__ import annotations

import argparse
import os

import jax

from ..data import (
    CIFAR10_MEAN,
    CIFAR10_STD,
    batch_iterator,
    load_cifar10,
    synthetic_dataset,
    train_val_split,
)
from ..models.api import build_model
from ..ops import parse_solver_dsl
from ..training import cyclic_lr, cyclic_momentum, make_optimizer
from ..utils import count_parameters, fix_seeds, get_logger
from .common import (
    add_multihost_flags,
    bool_flag,
    fit,
    parse_num_blocks,
    setup_multihost,
)

NETWORKS = [
    "metanode34", "metanode18", "metanode10", "metanode6", "metanode4",
    "premetanode34", "premetanode18", "premetanode10", "premetanode6",
    "premetanode4",
]


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    # architecture (train_and_attack.py:40-45, 161-182)
    p.add_argument("--is_odenet", type=bool_flag, default=True,
                   choices=[True, False])
    p.add_argument("--network", type=str, choices=NETWORKS,
                   default="premetanode10")
    p.add_argument("--in_planes", type=int, default=64)
    p.add_argument("--normalization_resblock", type=str, default="NF",
                   choices=["BN", "GN", "LN", "IN", "NF"])
    p.add_argument("--normalization_odeblock", type=str, default="NF",
                   choices=["BN", "GN", "LN", "IN", "NF"])
    p.add_argument("--normalization_bn1", type=str, default="NF",
                   choices=["BN", "GN", "LN", "IN", "NF"])
    p.add_argument("--num_gn_groups", type=int, default=32)
    p.add_argument("--param_normalization_resblock", type=str, default="PNF",
                   choices=["WN", "SN", "PNF"])
    p.add_argument("--param_normalization_odeblock", type=str, default="PNF",
                   choices=["WN", "SN", "PNF"])
    p.add_argument("--param_normalization_bn1", type=str, default="PNF",
                   choices=["WN", "SN", "PNF"])
    p.add_argument("--activation_resblock", type=str, default="GeLU",
                   choices=["ReLU", "GeLU", "GeLUtanh", "GeLUpoly", "Softsign", "Tanh", "AF"])
    p.add_argument("--activation_odeblock", type=str, default="GeLU",
                   choices=["ReLU", "GeLU", "GeLUtanh", "GeLUpoly", "Softsign", "Tanh", "AF"])
    p.add_argument("--activation_bn1", type=str, default="GeLU",
                   choices=["ReLU", "GeLU", "GeLUtanh", "GeLUpoly", "Softsign", "Tanh", "AF"])
    p.add_argument("--init", type=str, default=None,
                   help="None or 'orthogonal'")
    # solver / regime (train_and_attack.py:48-79)
    p.add_argument("--solvers", type=str, default="rk2,u,8,-1,0.5,-1")
    p.add_argument("--solver_mode", type=str, default="standalone",
                   choices=["switch", "ensemble", "standalone"])
    p.add_argument("--val_solver_modes",
                   type=lambda s: s.strip().split(","),
                   default=["standalone"])
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
    p.add_argument("--minimize_rk2_error", type=bool_flag, default=False,
                   choices=[True, False])
    # training (train_and_attack.py:83-119)
    p.add_argument("--seed", type=int, default=602)
    p.add_argument("--nepochs", "--nepochs_nn", dest="nepochs", type=int,
                   default=36)
    p.add_argument("--data_aug", type=bool_flag, default=True,
                   choices=[True, False])
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--test_batch_size", type=int, default=256)
    p.add_argument("--val_perc", type=float, default=0.1)
    p.add_argument("--optim", type=str, default="sgd",
                   choices=["sgd", "rmsprop", "adam"])
    p.add_argument("--weight_decay", type=float, default=0.0005)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--cycle_momentum", type=bool_flag, default=True,
                   choices=[True, False],
                   help="cycle momentum 0.8<->0.9 inversely to the cyclic "
                        "lr, like the reference's CyclicLR "
                        "cycle_momentum=(optim != 'adam') "
                        "(train_and_attack.py:503-508) — applies to sgd "
                        "AND rmsprop (torch RMSprop has a momentum buffer "
                        "that CyclicLR drives)")
    p.add_argument("--base_momentum", type=float, default=0.8)
    p.add_argument("--max_momentum", type=float, default=0.9)
    p.add_argument("--zero_grad_every", type=int, default=1)
    p.add_argument("--base_lr", type=float, default=1e-7)
    p.add_argument("--max_lr", type=float, default=0.1)
    p.add_argument("--step_size_up", type=int, default=3186)
    p.add_argument("--cyclic_lr_mode", type=str, default="triangular2")
    p.add_argument("--grad_clipping_threshold", type=float, default=None)
    # adversarial (train_and_attack.py:130-158)
    p.add_argument("--data_noise_std", type=float, default=0.0)
    p.add_argument("--adv_training_mode", default="clean",
                   choices=["clean", "fgsm", "at", "fgsm_random"])
    p.add_argument("--eps_adv_training", type=float, default=8 / 255)
    p.add_argument("--fgsm_random_step_size_training", type=float,
                   default=10 / 255)
    p.add_argument("--pgd_lr_training", type=float, default=2 / 255)
    p.add_argument("--pgd_niter_training", type=int, default=7)
    p.add_argument("--ss_loss", type=bool_flag, default=False,
                   choices=[True, False])
    p.add_argument("--ss_loss_reg", type=float, default=0.1)
    p.add_argument("--adv_testing_mode", default="clean",
                   choices=["clean", "fgsm", "at"])
    p.add_argument("--eps_adv_testing", type=float, default=8 / 255)
    p.add_argument("--pgd_lr_testing", type=float, default=2 / 255)
    p.add_argument("--pgd_niter_testing", type=int, default=7)
    # io
    p.add_argument("--download", action="store_true",
                   help="fetch CIFAR-10 into --data_root (default data/) if "
                        "missing — the torchvision download=True analog")
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--save_dir", type=str, default="./experiment_cifar")
    p.add_argument("--debug", action="store_true")
    p.add_argument("--resume", action="store_true")
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
                        "'data=4,model=2' (tp) or 'data=2,sp=2' (spatial) "
                        "or 'data=2,pp=2' (GPipe over same-shape ODE-block "
                        "stacks — metanode34/premetanode34 or a --num_blocks "
                        "override); shards the jitted step over a "
                        "jax.sharding.Mesh")
    p.add_argument("--pp_microbatches", type=int, default=0,
                   help="GPipe microbatches per step under --mesh pp= "
                        "(0 = the pp axis size)")
    p.add_argument("--num_blocks", type=str, default=None,
                   help="override the registry's per-stage (res,ode) "
                        "counts, e.g. '1,2;1,2' for two stages of one res "
                        "+ two ODE blocks — custom deep ODE stacks (the "
                        "shape pp pays on)")
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
    p.add_argument("--synthetic_train_size", type=int, default=8192)
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
        debug=args.debug, name="cifar",
    )
    logger.info(str(vars(args)))

    solvers = parse_solver_dsl(args.solvers)
    nb_override = {}
    if args.num_blocks:
        nb_override["num_blocks"] = parse_num_blocks(args.num_blocks)
    model = build_model(
        args.network,
        is_odenet=args.is_odenet,
        in_planes=args.in_planes,
        **nb_override,
        norms=(args.normalization_resblock, args.normalization_odeblock,
               args.normalization_bn1),
        num_gn_groups=args.num_gn_groups,
        param_norms=(args.param_normalization_resblock,
                     args.param_normalization_odeblock,
                     args.param_normalization_bn1),
        acts=(args.activation_resblock, args.activation_odeblock,
              args.activation_bn1),
    )
    params, _ = model.init(jax.random.key(0))
    logger.info(f"Number of parameters: {count_parameters(params)}")
    if args.init:
        from ..models.nn import apply_init_scheme

        # bind the ORIGINAL init: closing over the rebound `model` would
        # make reinit call itself (infinite recursion at create_train_state)
        base_init = model.init

        def reinit(key):
            p0, s0 = base_init(key)
            return apply_init_scheme(jax.random.fold_in(key, 1), p0,
                                     args.init), s0

        model = __import__("dataclasses").replace(model, init=reinit)

    args.data_mean = CIFAR10_MEAN
    args.data_std = CIFAR10_STD

    if getattr(args, "download", False):
        from ..data.download import ensure_dataset

        fetched = ensure_dataset("cifar10", args.data_root)
        if fetched:
            args.data_root = fetched
    if args.data_root:
        full_train = load_cifar10(args.data_root, train=True)
        test_ds = load_cifar10(args.data_root, train=False)
    else:
        logger.warning("no --data_root: falling back to synthetic data")
        full_train = synthetic_dataset(args.synthetic_train_size, (32, 32, 3), seed=args.seed)
        test_ds = synthetic_dataset(args.synthetic_test_size, (32, 32, 3), seed=args.seed + 1)
    train_ds, val_ds = train_val_split(full_train, args.val_perc,
                                      seed=args.seed)

    crop = 4 if args.data_aug else 0

    def train_data(epoch):
        return batch_iterator(
            train_ds, args.batch_size, seed=args.seed + epoch,
            crop_padding=crop, hflip=True,
            mean=CIFAR10_MEAN, std=CIFAR10_STD,
        )

    def eval_data():
        # drop_last=False: evaluate every sample (see PARITY.md
        # eval-denominator note)
        return batch_iterator(
            val_ds, args.test_batch_size, shuffle=False, drop_last=False,
            mean=CIFAR10_MEAN, std=CIFAR10_STD,
        )

    def test_data():
        return batch_iterator(
            test_ds, args.test_batch_size, shuffle=False, drop_last=False,
            mean=CIFAR10_MEAN, std=CIFAR10_STD,
        )

    sched = cyclic_lr(args.base_lr, args.max_lr, args.step_size_up,
                      args.cyclic_lr_mode)
    momentum = args.momentum
    if args.optim in ("sgd", "rmsprop") and args.cycle_momentum:
        momentum = cyclic_momentum(
            args.step_size_up, args.cyclic_lr_mode,
            args.base_momentum, args.max_momentum,
        )
    tx = make_optimizer(
        args.optim, sched, momentum=momentum,
        weight_decay=args.weight_decay,
        grad_clip=args.grad_clipping_threshold,
        every_k=args.zero_grad_every,
        nonfinite_backoff=args.nan_backoff,
    )

    config = {"args": vars(args), "solvers": args.solvers,
              "model": args.network}
    fit(model, solvers, tx, args, logger, train_data, eval_data,
        test_data_factory=test_data, config=config)


if __name__ == "__main__":
    main()
