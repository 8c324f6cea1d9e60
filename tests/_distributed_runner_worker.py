"""Subprocess worker for the two-process RUNNER-CLI test.

Usage:  python _distributed_runner_worker.py COORD NUM_PROCS RANK \
            LOCAL_DEVS SAVE_DIR OUT_JSON

Unlike `_distributed_worker.py` (which hand-wires one library-level train
step), this drives the ACTUAL mnist runner CLI end to end — argparse flags
(--coordinator/--num_hosts/--process_id, wired by runners/common.py's
setup_multihost) through `fit`'s multi-host epoch loop (per-process batch
slices -> host_local_batch_to_global) to the rank-0 orbax checkpoint.  A
2-process run must reproduce the 1-process run of this same script: the
global batches are identical (same seeded order, disjoint slices), so the
final params are the same computation under a different process topology.

Rank 0 writes {final train_loss, param checksum/head} from the metrics
JSONL + the restored checkpoint to OUT_JSON.
"""
import json
import os
import sys

coord, num_procs, rank, local_devs, save_dir, out_json = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
    sys.argv[5], sys.argv[6],
)

os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={local_devs}"
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from neural_ode_metasolver_tpu.runners import mnist_runner  # noqa: E402

argv = [
    "--solvers", "rk2,u,2,-1,0.5,-1",
    "--nepochs", "2",
    "--batch_size", "16",
    "--test_batch_size", "16",
    "--synthetic_train_size", "48",
    "--synthetic_test_size", "16",
    "--lr", "0.05",
    "--optim", "sgd",
    "--mesh", "data=-1",
    "--save_dir", save_dir,
]
if num_procs > 1:
    argv += ["--coordinator", coord,
             "--num_hosts", str(num_procs),
             "--process_id", str(rank)]

mnist_runner.main(argv)

assert len(jax.local_devices()) == local_devs
assert len(jax.devices()) == num_procs * local_devs

# EVERY rank restores (multi-host orbax restore is collective — a
# rank-gated restore would strand the others in its barrier) and writes
# its own OUT_JSON; the metrics JSONL is rank 0's alone.
import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from neural_ode_metasolver_tpu.models.api import build_model  # noqa: E402
from neural_ode_metasolver_tpu.runners.common import (  # noqa: E402
    optimizer_from_saved_args,
)
from neural_ode_metasolver_tpu.training import (  # noqa: E402
    create_train_state,
    restore_checkpoint,
)

train_losses = None
if rank == 0:
    losses = [
        json.loads(line)
        for line in open(os.path.join(save_dir, "metrics.jsonl"))
    ]
    train_losses = [r["train_loss"] for r in losses if "train_loss" in r]

model = build_model("mnist")
# structure-matching opt_state template: the ONE flag->optax mapping
# every restore path shares (runners/common.optimizer_from_saved_args)
template = create_train_state(
    model,
    optimizer_from_saved_args(
        {"optim": "sgd", "momentum": 0.9, "weight_decay": 5e-4}),
    jax.random.key(0),
)
ts, _ = restore_checkpoint(os.path.join(save_dir, "last"), template)
leaves = jax.tree_util.tree_leaves(ts.params)
result = {
    "rank": rank,
    "num_procs": num_procs,
    "global_devices": len(jax.devices()),
    "train_losses": train_losses,
    "param_checksum": float(sum(jnp.sum(jnp.abs(l)) for l in leaves)),
    "param_head": np.asarray(leaves[0]).ravel()[:4].tolist(),
    "step": int(ts.step),
}
with open(out_json, "w") as f:
    json.dump(result, f)
print("WORKER_DONE", rank)
