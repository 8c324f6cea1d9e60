"""Subprocess worker for the two-process ``jax.distributed`` test.

Usage:  python _distributed_worker.py COORD NUM_PROCS RANK LOCAL_DEVS OUT_JSON

Each process owns LOCAL_DEVS virtual CPU devices; together they form one
global ``data=NUM_PROCS*LOCAL_DEVS`` mesh.  Every process feeds its
*disjoint* slice of the global batch through ``host_local_batch_to_global``,
runs ONE jitted train step, and writes {loss, param_checksum, ...} to
OUT_JSON — so a 2-process run can be asserted equal to the 1-process run of
this same script (identical code path, different process topology).
"""
import json
import os
import sys

coord, num_procs, rank, local_devs, out_json = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
    sys.argv[5],
)

os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={local_devs}"
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from neural_ode_metasolver_tpu.parallel import (  # noqa: E402
    host_local_batch_to_global,
    initialize_distributed,
    make_mesh,
    make_parallel_train_step,
)

if num_procs > 1:
    initialize_distributed(coord, num_procs, rank)

assert len(jax.local_devices()) == local_devs
assert len(jax.devices()) == num_procs * local_devs

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from neural_ode_metasolver_tpu.models.api import build_model  # noqa: E402
from neural_ode_metasolver_tpu.ops import (  # noqa: E402
    SolverOptions,
    create_solver,
)
from neural_ode_metasolver_tpu.training import (  # noqa: E402
    create_train_state,
    make_optimizer,
    make_train_step,
)

GLOBAL_BATCH = 16

model = build_model("mnist", dim=16)
solvers = [create_solver("rk2", "u", n_steps=2, u0=0.5)]
tx = make_optimizer("sgd", 0.1, momentum=0.9)
ts = create_train_state(model, tx, jax.random.key(0))

mesh = make_mesh({"data": num_procs * local_devs})
step = make_parallel_train_step(
    make_train_step(model, tx, solvers, SolverOptions(),
                    jit_compile=False, donate=False),
    mesh, ts,
)

rs = np.random.RandomState(42)
x_all = rs.rand(GLOBAL_BATCH, 28, 28, 1).astype(np.float32)
y_all = rs.randint(0, 10, size=GLOBAL_BATCH).astype(np.int32)
per = GLOBAL_BATCH // num_procs
x_local = x_all[rank * per:(rank + 1) * per]
y_local = y_all[rank * per:(rank + 1) * per]

gx, gy = host_local_batch_to_global((x_local, y_local), mesh)
ts_repl = jax.device_put(
    ts, jax.tree_util.tree_map(
        lambda _: jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec()
        ),
        ts,
    )
)
ts2, metrics = step(ts_repl, gx, gy, jax.random.key(7))

leaves = jax.tree_util.tree_leaves(ts2.params)
checksum = float(sum(jnp.sum(jnp.abs(l)) for l in leaves))
first = np.asarray(leaves[0]).ravel()[:4].tolist()
result = {
    "rank": rank,
    "num_procs": num_procs,
    "global_devices": len(jax.devices()),
    "loss": float(metrics["loss"]),
    "grad_norm": float(metrics["grad_norm"]),
    "param_checksum": checksum,
    "param_head": first,
}
with open(out_json, "w") as f:
    json.dump(result, f)
print("WORKER_DONE", json.dumps(result))
