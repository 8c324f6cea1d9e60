"""Learn the RK2 coefficient u by gradient descent on integration error.

The framework's core premise is that the solver itself is a differentiable,
parametrized object.  This demo validates it end to end: train u (only u —
no network) to minimize the gap between a coarse RK2(u) solve and a fine
reference solve of random nonlinear ODEs.  Classical numerical analysis says
u = 2/3 minimizes the dominant RK2 local-truncation-error term; gradient
descent through the integrator rediscovers that region from data (the exact
optimum depends on the problem family — observed convergence to ~0.55-0.65
from a 0.25 start).

  python examples/learn_solver_coefficient.py [--platform cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax

from neural_ode_metasolver_tpu.ops import odeint_final, rk2_tableau


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--u0", type=float, default=0.25)
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    def rhs(a, t, y):
        # a family of smooth nonlinear ODEs parametrized by a
        return jnp.tanh(a[0] * y) + a[1] * jnp.sin(2.0 * t + a[2])

    def loss_fn(u, key):
        a = jax.random.normal(key, (3,), jnp.float32)
        y0 = jax.random.normal(jax.random.fold_in(key, 1), (8,), jnp.float32)
        f = lambda t, y: rhs(a, t, y)
        coarse = odeint_final(rk2_tableau(u), f, y0, 0.0, 1.0, n_steps=4)
        fine = odeint_final(rk2_tableau(jnp.float32(2 / 3)), f, y0, 0.0, 1.0,
                            n_steps=256)
        return jnp.mean((coarse - fine) ** 2)

    tx = optax.adam(3e-3)
    u = jnp.float32(args.u0)
    opt_state = tx.init(u)

    @jax.jit
    def step(u, opt_state, key):
        loss, g = jax.value_and_grad(loss_fn)(u, key)
        updates, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(u, updates), opt_state, loss

    key = jax.random.key(0)
    for i in range(args.steps):
        key, sub = jax.random.split(key)
        u, opt_state, loss = step(u, opt_state, sub)
        if i % 50 == 0 or i == args.steps - 1:
            print(f"step {i:4d}  u = {float(u):.4f}  loss = {float(loss):.3e}")
    print(f"\nlearned u = {float(u):.4f}   (theory: 2/3 = {2/3:.4f})")


if __name__ == "__main__":
    main()
