"""VMEM-resident ODE-block megakernel tests (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_ode_metasolver_tpu.ops.pallas_ode_block import (
    ode_block_rk2_forward,
    reference_ode_block_rk2,
)


def make_inputs(n=4, h=8, w=8, c=16, dtype=jnp.float32, seed=0):
    k1, k2, k3 = jax.random.split(jax.random.key(seed), 3)
    y0 = (jax.random.normal(k1, (n, h, w, c), jnp.float32) * 0.5).astype(dtype)
    w1 = (jax.random.normal(k2, (3, 3, c, c), jnp.float32) * 0.1).astype(dtype)
    w2 = (jax.random.normal(k3, (3, 3, c, c), jnp.float32) * 0.1).astype(dtype)
    return y0, w1, w2


@pytest.mark.parametrize("u,n_steps", [(0.5, 2), (0.5, 8), (1.0, 4),
                                       (2 / 3, 3)])
def test_megakernel_matches_xla_reference(u, n_steps):
    y0, w1, w2 = make_inputs()
    out_p = ode_block_rk2_forward(y0, w1, w2, u, n_steps, interpret=True)
    out_r = reference_ode_block_rk2(y0, w1, w2, u, n_steps)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_r),
                               atol=2e-5)


def test_megakernel_batch_tiling():
    y0, w1, w2 = make_inputs(n=6)
    out_full = ode_block_rk2_forward(y0, w1, w2, 0.5, 2, batch_tile=6,
                                     interpret=True)
    out_tiled = ode_block_rk2_forward(y0, w1, w2, 0.5, 2, batch_tile=2,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(out_full), np.asarray(out_tiled),
                               atol=1e-6)


def test_megakernel_matches_model_rhs():
    """The megakernel must equal the actual flagship ODE block: meta_integrate
    over the premetanode10 RHS with NF norms and GeLU."""
    from neural_ode_metasolver_tpu.models.odenet_cifar10 import (
        _odefunc_apply,
        premetanode10,
    )
    from neural_ode_metasolver_tpu.ops import SolverOptions, create_solver, meta_integrate

    cfg = premetanode10(in_planes=16)
    y0, w1, w2 = make_inputs(c=16)
    p_eff = {"conv1": {"kernel": w1}, "conv2": {"kernel": w2},
             "bn1": None, "bn2": None}
    rhs = lambda t, y: _odefunc_apply(cfg, p_eff, t, y)
    solver = create_solver("rk2", "u", n_steps=4, u0=0.5)
    y_model, _ = meta_integrate([solver], rhs, y0, SolverOptions())
    y_kernel = ode_block_rk2_forward(y0, w1, w2, 0.5, 4, interpret=True)
    np.testing.assert_allclose(np.asarray(y_model), np.asarray(y_kernel),
                               atol=2e-5)


def test_megakernel_bf16():
    y0, w1, w2 = make_inputs(dtype=jnp.bfloat16)
    out_p = ode_block_rk2_forward(y0, w1, w2, 0.5, 4, interpret=True)
    out_r = reference_ode_block_rk2(y0, w1, w2, 0.5, 4)
    assert out_p.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out_p, np.float32), np.asarray(out_r, np.float32),
        atol=0.15, rtol=0.1,
    )
