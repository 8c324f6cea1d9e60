"""Golden numerics parity: full MNIST MetaNODE forward (downsampling ->
8-step RK2 ODE solve -> head) against a torch replica of the reference
architecture (odenet_mnist/layers.py) with identical weights, including the
reference's exact ``_make_step`` stepping (rk_parametric_order2stage2.py:87-93).
This is the end-to-end cross-check behind the <0.5%-accuracy parity target
(SURVEY.md §7 'hard parts')."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from neural_ode_metasolver_tpu.models import MnistConfig, apply_mnist, init_mnist  # noqa: E402
from neural_ode_metasolver_tpu.ops import SolverOptions, create_solver  # noqa: E402


from torch_ref import (  # noqa: E402
    TorchMetaNODE,
    copy_params_to_torch,
)


@pytest.mark.parametrize("u,n_steps", [(0.5, 8), (1.0, 4), (2 / 3, 2)])
def test_full_mnist_forward_matches_torch(u, n_steps):
    cfg = MnistConfig()
    params = init_mnist(jax.random.key(0), cfg)

    tm = TorchMetaNODE()
    copy_params_to_torch(tm, params)

    x = np.random.RandomState(0).rand(4, 28, 28, 1).astype(np.float32)
    solver = create_solver("rk2", "u", n_steps=n_steps, u0=u)
    logits, _ = apply_mnist(
        params, jnp.asarray(x), [solver], SolverOptions(), cfg=cfg
    )
    with torch.no_grad():
        t_logits = tm(
            torch.tensor(x.transpose(0, 3, 1, 2)), u=u, n_steps=n_steps
        ).numpy()
    np.testing.assert_allclose(np.asarray(logits), t_logits, atol=2e-4)
