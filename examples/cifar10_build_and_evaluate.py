"""CIFAR-10 demo: build premetanode10 and evaluate it under all four
meta-solver regimes — the script form of the reference's
``examples/cifar10/Build the model.ipynb`` + ``Evaluate the model.ipynb``.

Regimes demonstrated (Evaluate nb cells 13-28):
  1. standalone          — one 8-step RK2(u=0.5)
  2. solver switching    — probs [0.6, 0.4] over u in {0.5, 1.0}
  3. solver ensembling   — weights [0.6, 0.4]
  4. model ensembling    — softmax-prob averaging over solvers noised with
                           Normal(std=0.2), attacked with ensemble-FGSM

Pass --checkpoint <dir> to evaluate trained weights (from the cifar_runner);
otherwise random init + synthetic data demonstrate the API end to end.
Add --data_root for real CIFAR-10.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from neural_ode_metasolver_tpu.data import (
    CIFAR10_MEAN,
    CIFAR10_STD,
    batch_iterator,
    load_cifar10,
    synthetic_dataset,
)
from neural_ode_metasolver_tpu.models.api import build_model
from neural_ode_metasolver_tpu.ops import (
    SolverOptions,
    create_solver,
    solver_ensemble_by_noising,
)
from neural_ode_metasolver_tpu.training import (
    AttackConfig,
    accuracy,
    accuracy_ensemble,
    adversarial_accuracy,
    adversarial_accuracy_ensemble,
    create_train_state,
    load_checkpoint_config,
    restore_checkpoint,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--in_planes", type=int, default=64)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--eps", type=float, default=8 / 255)
    p.add_argument("--n_steps", type=int, default=8)
    p.add_argument("--n_eval", type=int, default=512)
    p.add_argument("--platform", type=str, default=None,
                   help="force a jax backend, e.g. 'cpu'")
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    # --- Build the model (Build nb) -------------------------------------
    model = build_model("premetanode10", in_planes=args.in_planes)
    if args.checkpoint:
        # the saved config determines the opt-state pytree layout
        # (cycle_momentum / clipping / MultiSteps / nan_backoff), so the
        # template optimizer must be rebuilt from it — not hardcoded
        from neural_ode_metasolver_tpu.runners.common import (
            optimizer_from_saved_args,
        )

        cfg0 = load_checkpoint_config(args.checkpoint) or {}
        tx = optimizer_from_saved_args(cfg0.get("args", {}))
        template = create_train_state(model, tx, jax.random.key(0))
        ts, cfg = restore_checkpoint(args.checkpoint, template)
        params, state = ts.params, ts.model_state
        print(f"loaded checkpoint (val acc {cfg.get('val_acc')})")
    else:
        params, state = model.init(jax.random.key(0))
        print("random init (pass --checkpoint for trained weights)")

    if args.data_root:
        ds = load_cifar10(args.data_root, train=False)
    else:
        ds = synthetic_dataset(args.n_eval, (32, 32, 3), seed=1)

    def data():
        return batch_iterator(ds, args.batch_size, shuffle=False,
                              mean=CIFAR10_MEAN, std=CIFAR10_STD)

    fgsm = AttackConfig(mode="fgsm", eps=args.eps, mean=CIFAR10_MEAN,
                        std=CIFAR10_STD)
    key = jax.random.key(0)

    # --- 1. standalone ---------------------------------------------------
    s05 = create_solver("rk2", "u", n_steps=args.n_steps, u0=0.5)
    opts = SolverOptions()
    acc = accuracy(model, params, state, [s05], opts, data())
    adv = adversarial_accuracy(model, params, state, [s05], opts, data(),
                               fgsm, key)
    print(f"standalone            clean {acc:.4f}  fgsm {adv:.4f}")

    # --- 2. solver switching --------------------------------------------
    s10 = create_solver("rk2", "u", n_steps=args.n_steps, u0=1.0)
    opts_sw = SolverOptions(solver_mode="switch", switch_probs=[0.6, 0.4])
    acc = accuracy(model, params, state, [s05, s10], opts_sw, data(),
                   key=jax.random.key(1))
    adv = adversarial_accuracy(model, params, state, [s05, s10], opts_sw,
                               data(), fgsm, jax.random.key(2))
    print(f"switch [0.6,0.4]      clean {acc:.4f}  fgsm {adv:.4f}")

    # --- 3. solver ensembling --------------------------------------------
    opts_en = SolverOptions(solver_mode="ensemble", ensemble_prob=1.0,
                            ensemble_weights=[0.6, 0.4])
    acc = accuracy(model, params, state, [s05, s10], opts_en, data(),
                   key=jax.random.key(3))
    adv = adversarial_accuracy(model, params, state, [s05, s10], opts_en,
                               data(), fgsm, jax.random.key(4))
    print(f"solver ens [0.6,0.4]  clean {acc:.4f}  fgsm {adv:.4f}")

    # --- 4. model ensembling (noised solvers, Evaluate nb cells 25-28) ---
    noised = solver_ensemble_by_noising(
        s05, jax.random.key(5), ensemble_size=2, std=0.2, noise_type="normal"
    )
    members = [(params, state, [s], SolverOptions()) for s in noised]
    acc = accuracy_ensemble(model, members, data())
    adv = adversarial_accuracy_ensemble(model, members, data(), fgsm,
                                        jax.random.key(6))
    print(f"model ensembling      clean {acc:.4f}  fgsm {adv:.4f}")


if __name__ == "__main__":
    main()
