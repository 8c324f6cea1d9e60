"""MNIST demo: build the MetaNODE and evaluate clean + PGD robust accuracy —
the script form of ``examples/mnist/Build the model.ipynb`` +
``Evaluate the model.ipynb`` (which loads checkpoint_15444.pth and evaluates
with an rk4,u3 solver, PGD eps=0.3, lr=2/255, 7 iters).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from neural_ode_metasolver_tpu.data import (
    batch_iterator,
    load_mnist,
    synthetic_dataset,
)
from neural_ode_metasolver_tpu.models.api import build_model
from neural_ode_metasolver_tpu.ops import SolverOptions, create_solver
from neural_ode_metasolver_tpu.training import (
    AttackConfig,
    accuracy,
    adversarial_accuracy,
    create_train_state,
    load_checkpoint_config,
    restore_checkpoint,
    sn_test,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--n_steps", type=int, default=8)
    p.add_argument("--n_eval", type=int, default=512)
    p.add_argument("--platform", type=str, default=None,
                   help="force a jax backend, e.g. 'cpu'")
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    model = build_model("mnist")
    if args.checkpoint:
        # rebuild the optimizer from the saved config so the template's
        # opt-state pytree matches (nan_backoff etc. change the layout)
        from neural_ode_metasolver_tpu.runners.common import (
            optimizer_from_saved_args,
        )

        cfg0 = load_checkpoint_config(args.checkpoint) or {}
        tx = optimizer_from_saved_args(cfg0.get("args", {}))
        template = create_train_state(model, tx, jax.random.key(0))
        ts, _ = restore_checkpoint(args.checkpoint, template)
        params, state = ts.params, ts.model_state
    else:
        params, state = model.init(jax.random.key(0))
        print("random init (pass --checkpoint for trained weights)")

    if args.data_root:
        ds = load_mnist(args.data_root, train=False)
    else:
        ds = synthetic_dataset(args.n_eval, (28, 28, 1), seed=1)

    def data():
        return batch_iterator(ds, args.batch_size, shuffle=False)

    # rk4 'u3' solver as in the reference notebook
    solver = create_solver("rk4", "u3", n_steps=args.n_steps, u0=1 / 3)
    opts = SolverOptions()

    acc = accuracy(model, params, state, [solver], opts, data())
    pgd = AttackConfig(mode="at", eps=0.3, pgd_lr=2 / 255, pgd_niter=7)
    adv = adversarial_accuracy(model, params, state, [solver], opts, data(),
                               pgd, jax.random.key(0))
    print(f"clean acc {acc:.4f}   PGD(0.3, 2/255, 7) acc {adv:.4f}")

    # step-count sweep (sn_test, the pkl-table generator)
    accs = sn_test(model, params, state, solver, opts, data,
                   nsteps_grid=[1, 2, 4, 8])
    print("sn_test steps [1,2,4,8]:", [round(a, 4) for a in accs])


if __name__ == "__main__":
    main()
