"""Step-count robustness sweep (sn_test) on a trained model — the experiment
behind the reference's examples/cifar10/checkpoints/accuracy/*.pkl tables
(steps_arr sweep of a trained checkpoint, odenet_mnist/metrics.py:27-41),
run on real handwritten digits.

  python scripts/digits_sn_test.py --nepochs 36 --steps_grid 1,2,4,6,8,10,12
"""
import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from neural_ode_metasolver_tpu.data import batch_iterator, load_digits_dataset
from neural_ode_metasolver_tpu.models.api import build_model
from neural_ode_metasolver_tpu.ops import SolverOptions, create_solver
from neural_ode_metasolver_tpu.training import (
    AttackConfig,
    create_train_state,
    make_optimizer,
    make_train_step,
    sn_test,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--nepochs", type=int, default=36)
    p.add_argument("--train_steps", type=int, default=8)
    p.add_argument("--steps_grid",
                   type=lambda s: [int(i) for i in s.split(",")],
                   default=[1, 2, 4, 6, 8, 10, 12, 16])
    p.add_argument("--output_csv", type=str,
                   default="results/digits_sn_test.csv")
    args = p.parse_args()

    train_ds, test_ds = load_digits_dataset(seed=0)
    model = build_model("mnist", dim=64)
    solver = create_solver("rk2", "u", n_steps=args.train_steps, u0=0.5)
    opts = SolverOptions()
    tx = make_optimizer("rmsprop", 1e-3, weight_decay=5e-4)
    step = make_train_step(
        model, tx, [solver], opts,
        attack_cfg=AttackConfig(mode="at", eps=0.3, pgd_lr=2 / 255,
                                pgd_niter=7),
    )
    key = jax.random.key(args.seed)
    key, k_init = jax.random.split(key)
    ts = create_train_state(model, tx, k_init)
    for epoch in range(args.nepochs):
        for x, y in batch_iterator(train_ds, 128,
                                   seed=args.seed * 977 + epoch,
                                   crop_padding=4):
            key, sub = jax.random.split(key)
            ts, _ = step(ts, jnp.asarray(x), jnp.asarray(y), sub)

    data = lambda: batch_iterator(test_ds, 256, shuffle=False,
                                  drop_last=False)
    accs = sn_test(model, ts.params, ts.model_state, solver, opts, data,
                   args.steps_grid)
    os.makedirs(os.path.dirname(args.output_csv) or ".", exist_ok=True)
    with open(args.output_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["n_steps", "clean_acc"])
        for n, a in zip(args.steps_grid, accs):
            print(f"n_steps={n:3d} clean_acc={a:.4f}", flush=True)
            w.writerow([n, a])
    # also emit the reference's pickle schema (its Evaluate-notebook format,
    # examples/cifar10/checkpoints/accuracy/*.pkl)
    from neural_ode_metasolver_tpu.training import save_accuracy_table

    pkl_path = os.path.splitext(args.output_csv)[0] + ".pkl"
    save_accuracy_table(pkl_path, [accs], args.steps_grid)
    print("wrote", args.output_csv, "and", pkl_path)


if __name__ == "__main__":
    main()
