"""Model-level adjoint integration: forward identical to backprop mode,
gradients finite and close (up to O(h^p) discretization error)."""
import jax
import jax.numpy as jnp
import numpy as np

from neural_ode_metasolver_tpu.models import MnistConfig, apply_mnist, init_mnist
from neural_ode_metasolver_tpu.models.api import build_model
from neural_ode_metasolver_tpu.ops import SolverOptions, create_solver


def test_mnist_adjoint_forward_identical_and_grad_close():
    cfg = MnistConfig(dim=16)
    params = init_mnist(jax.random.key(0), cfg)
    solvers = [create_solver("rk2", "u", n_steps=8, u0=0.5)]
    x = jax.random.normal(jax.random.key(1), (2, 28, 28, 1), jnp.float32)

    lb, _ = apply_mnist(params, x, solvers, SolverOptions(), cfg=cfg)
    la, _ = apply_mnist(params, x, solvers, SolverOptions(), cfg=cfg,
                        integration_method="adjoint")
    np.testing.assert_allclose(np.asarray(lb), np.asarray(la), atol=1e-5)

    def loss(params, method):
        l, _ = apply_mnist(params, x, solvers, SolverOptions(), cfg=cfg,
                           integration_method=method)
        return jnp.sum(jax.nn.log_softmax(l)[:, 0])

    gb = jax.grad(loss)(params, "backprop")
    ga = jax.grad(loss)(params, "adjoint")
    fb = jnp.concatenate([v.ravel() for v in jax.tree_util.tree_leaves(gb)])
    fa = jnp.concatenate([v.ravel() for v in jax.tree_util.tree_leaves(ga)])
    assert np.isfinite(np.asarray(fa)).all()
    rel = float(jnp.linalg.norm(fb - fa) / (jnp.linalg.norm(fb) + 1e-9))
    # the two gradient estimators differ by the O(h^2) discretization error;
    # ~0.12 relative is the empirically observed level at 8 RK2 steps here
    assert rel < 0.3, rel


def test_cifar_adjoint_in_jitted_train_grad():
    model = build_model("premetanode6", in_planes=16)
    params, state = model.init(jax.random.key(0))
    solvers = [create_solver("rk2", "u", n_steps=4, u0=0.5)]
    x = jax.random.normal(jax.random.key(1), (2, 16, 16, 3), jnp.float32)
    y = jnp.asarray([1, 3])

    @jax.jit
    def g(params):
        def loss(params):
            logits, _, _ = model.apply(
                params, state, x, solvers, SolverOptions(),
                integration_method="adjoint",
            )
            logp = jax.nn.log_softmax(logits)
            return -jnp.mean(logp[jnp.arange(2), y])

        return jax.grad(loss)(params)

    out = g(params)
    leaves = jax.tree_util.tree_leaves(out)
    assert all(np.isfinite(np.asarray(v)).all() for v in leaves)
    assert any(float(jnp.abs(v).sum()) > 0 for v in leaves)
