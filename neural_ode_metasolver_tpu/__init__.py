"""neural_ode_metasolver_tpu — a TPU-native meta-solver framework for neural ODEs.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``juliagusak/neural-ode-metasolver`` ("SOPA"): neural ODEs whose fixed-step
Runge-Kutta solver is itself parametrized (u, v -> Butcher tableau), four
meta-solver regimes (standalone / switching / smoothing / ensembling),
conv-net ODE architectures for MNIST and CIFAR-10, an adversarial-attack
library (FGSM, FGSM-random, PGD, ensemble-FGSM), and an adversarial
training/eval engine — all compiled end-to-end with jit/pjit and sharded over
a ``jax.sharding.Mesh`` for multi-chip execution.

Layering (bottom to top, cf. SURVEY.md §1):
  ops/       solver core: tableaus, scan integrator, regimes, smoothing noise
  models/    ODE-net model zoo (MNIST MetaNODE, CIFAR metanode/premetanode)
  attacks/   adversarial attacks as pure functions of a forward closure
  data/      input pipelines (on-disk IDX / CIFAR binary; synthetic fallback)
  training/  jitted train/eval steps, optimizers, LR schedules, checkpoints
  parallel/  device mesh + sharding (dp / tp / ensemble-parallel)
  runners/   CLIs with reference flag parity (--solvers DSL etc.)
"""

__version__ = "0.1.0"

from . import ops  # noqa: F401
