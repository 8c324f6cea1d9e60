"""Attack tests: hand-computable linear models, box constraints, torch parity
for FGSM on a linear model, and nested-grad composition through an ODE solve."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_ode_metasolver_tpu.attacks import (
    clean,
    cross_entropy,
    fgsm,
    fgsm2ensemble,
    fgsm_random,
    inv_normalize,
    normalize,
    pgd,
)

# A tiny linear "image classifier": logits = W @ flatten(x) with known W.
C, H, Wd, K = 1, 2, 2, 3
Wmat = jnp.asarray(
    np.linspace(-1, 1, K * H * Wd * C).reshape(K, H * Wd * C), jnp.float32
)


def linear_forward(x):
    return x.reshape(x.shape[0], -1) @ Wmat.T


def batch():
    x = jnp.asarray(
        np.random.RandomState(0).uniform(0.2, 0.8, (4, H, Wd, C)),
        jnp.float32,
    )
    y = jnp.asarray([0, 1, 2, 0])
    return x, y


def test_clean_identity():
    x, y = batch()
    xa, ya = clean(x, y)
    assert xa is x and ya is y


def test_cross_entropy_matches_manual():
    logits = jnp.asarray([[2.0, 0.0, -1.0], [0.5, 0.5, 0.5]], jnp.float32)
    y = jnp.asarray([0, 2])
    ce = cross_entropy(logits, y)
    expected = -np.mean(
        [
            np.log(np.exp(2.0) / np.exp([2.0, 0.0, -1.0]).sum()),
            np.log(1 / 3),
        ]
    )
    np.testing.assert_allclose(float(ce), expected, rtol=1e-6)


def test_fgsm_sign_step_on_linear_model():
    """For a linear model the FGSM perturbation must be exactly
    eps * sign(dCE/dx), elementwise, inside the [0,1] box."""
    x, y = batch()
    eps = 0.05
    xa, _ = fgsm(linear_forward, x, y, eps)
    g = jax.grad(lambda x: cross_entropy(linear_forward(x), y))(x)
    expected = jnp.clip(x + eps * jnp.sign(g), 0, 1)
    np.testing.assert_allclose(np.asarray(xa), np.asarray(expected), atol=1e-7)


def test_fgsm_respects_normalization_roundtrip():
    mean, std = (0.4,), (0.2,)
    x01, y = batch()
    x = normalize(x01, mean, std)
    xa, _ = fgsm(linear_forward, x, y, 0.03, mean, std)
    back = inv_normalize(xa, mean, std)
    assert float(back.min()) >= -1e-6 and float(back.max()) <= 1 + 1e-6
    # perturbation in pixel space bounded by eps
    assert float(jnp.abs(back - x01).max()) <= 0.03 + 1e-6


def test_fgsm_increases_loss():
    x, y = batch()
    xa, _ = fgsm(linear_forward, x, y, 0.05)
    l0 = float(cross_entropy(linear_forward(x), y))
    l1 = float(cross_entropy(linear_forward(xa), y))
    assert l1 > l0


def test_fgsm_random_box_and_eps():
    mean, std = (0.45, 0.45, 0.45), (0.2, 0.21, 0.22)
    rs = np.random.RandomState(1)
    x01 = jnp.asarray(rs.uniform(0, 1, (4, 2, 2, 3)), jnp.float32)
    y = jnp.asarray([0, 1, 2, 0])
    fwd = lambda x: x.reshape(x.shape[0], -1) @ jnp.asarray(
        np.linspace(-1, 1, 3 * 12).reshape(3, 12), jnp.float32
    ).T
    x = normalize(x01, mean, std)
    xa, _ = fgsm_random(
        fwd, jax.random.key(0), x, y, epsilon=8 / 255, alpha=10 / 255,
        mean=mean, std=std,
    )
    back = inv_normalize(xa, mean, std)
    assert float(back.min()) >= -1e-5 and float(back.max()) <= 1 + 1e-5
    # pixel-space perturbation within eps (both clamps compose to this)
    assert float(jnp.abs(back - x01).max()) <= 8 / 255 + 1e-5


def test_pgd_box_constraints_and_monotone_loss():
    x, y = batch()
    eps, lr, it = 0.1, 0.03, 7
    xa, _ = pgd(linear_forward, jax.random.key(0), x, y, eps, lr, it)
    assert float(jnp.abs(xa - x).max()) <= eps + 1e-6
    assert float(xa.min()) >= -1e-6 and float(xa.max()) <= 1 + 1e-6
    l0 = float(cross_entropy(linear_forward(x), y))
    l1 = float(cross_entropy(linear_forward(xa), y))
    assert l1 > l0


def test_pgd_no_random_start_deterministic():
    x, y = batch()
    xa1, _ = pgd(linear_forward, None, x, y, 0.1, 0.03, 3,
                 randomized_start=False)
    xa2, _ = pgd(linear_forward, None, x, y, 0.1, 0.03, 3,
                 randomized_start=False)
    np.testing.assert_allclose(np.asarray(xa1), np.asarray(xa2), atol=0)


def test_pgd_stronger_than_fgsm():
    x, y = batch()
    xf, _ = fgsm(linear_forward, x, y, 0.1)
    xp, _ = pgd(linear_forward, jax.random.key(0), x, y, 0.1, 0.03, 10)
    lf = float(cross_entropy(linear_forward(xf), y))
    lp = float(cross_entropy(linear_forward(xp), y))
    assert lp >= lf - 1e-3


def test_fgsm2ensemble_reduces_to_fgsm_for_single_model():
    x, y = batch()
    # For one model, NLL(log softmax) == CE, so the ensemble attack equals FGSM
    xa_e, _ = fgsm2ensemble([linear_forward], x, y, 0.05)
    xa_f, _ = fgsm(linear_forward, x, y, 0.05)
    np.testing.assert_allclose(np.asarray(xa_e), np.asarray(xa_f), atol=1e-6)


def test_fgsm2ensemble_two_models():
    W2 = Wmat[::-1]
    fwd2 = lambda x: x.reshape(x.shape[0], -1) @ W2.T
    x, y = batch()
    xa, _ = fgsm2ensemble([linear_forward, fwd2], x, y, 0.05)
    assert float(jnp.abs(xa - x).max()) <= 0.05 + 1e-6


def test_fgsm_matches_torch_on_linear_model():
    torch = pytest.importorskip("torch")
    x, y = batch()
    eps = 0.07
    xa, _ = fgsm(linear_forward, x, y, eps)

    xt = torch.tensor(np.asarray(x).reshape(4, -1), requires_grad=True)
    Wt = torch.tensor(np.asarray(Wmat))
    loss = torch.nn.functional.cross_entropy(
        xt @ Wt.T, torch.tensor(np.asarray(y))
    )
    (g,) = torch.autograd.grad([loss], [xt])
    x_adv = torch.clamp(xt.detach() + eps * g.sign(), 0, 1).numpy()
    np.testing.assert_allclose(
        np.asarray(xa).reshape(4, -1), x_adv, atol=1e-6
    )


def test_attack_composes_inside_jitted_train_grad():
    """Nested differentiation: input-grad (attack) inside param-grad, through
    an actual ODE solve — the critical pattern of SURVEY.md §3.2."""
    from neural_ode_metasolver_tpu.ops import SolverOptions, create_solver
    from neural_ode_metasolver_tpu.models import (
        MnistConfig,
        apply_mnist,
        init_mnist,
    )

    cfg = MnistConfig()
    params = init_mnist(jax.random.key(0), cfg)
    solvers = [create_solver("rk2", "u", n_steps=2, u0=0.5)]
    x = jax.random.normal(jax.random.key(1), (2, 28, 28, 1), jnp.float32)
    y = jnp.asarray([1, 4])

    @jax.jit
    def adv_loss(params):
        fwd = lambda xi: apply_mnist(
            params, xi, solvers, SolverOptions(), cfg=cfg
        )[0]
        xa, _ = fgsm(fwd, x, y, 0.1)
        return cross_entropy(fwd(xa), y)

    g = jax.grad(adv_loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(v)).all() for v in leaves)
    assert any(float(jnp.abs(v).sum()) > 0 for v in leaves)


def test_fgsm_output_is_detached():
    """fgsm/fgsm2ensemble must stop_gradient their output (reference
    .detach(), fgsm.py:40) so composing them inside a differentiated loss
    cannot build double-backward through the inner input-grad."""
    w = jnp.array([[1.0, -1.0], [0.5, 2.0]])
    x = jnp.array([0.3, 0.7]).reshape(1, 1, 1, 2)  # NHWC toy image
    y = jnp.array([1])

    def outer(w):
        fwd = lambda xi: xi.reshape(xi.shape[0], -1) @ w
        xa, _ = fgsm(fwd, x, y, eps=0.1)
        xb, _ = fgsm2ensemble([fwd], x, y, eps=0.1)
        return (cross_entropy(fwd(xa), y) + cross_entropy(fwd(xb), y),
                (xa, xb))

    (loss, (xa, xb)), g = jax.value_and_grad(outer, has_aux=True)(w)
    # gradient exists and is finite; xa/xb carry no grad path of their own
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.all(np.isfinite(np.asarray(loss)))
    flat = lambda a: a.reshape(a.shape[0], -1)
    ref = jax.grad(
        lambda w: cross_entropy(flat(jax.lax.stop_gradient(xa)) @ w, y)
        + cross_entropy(flat(jax.lax.stop_gradient(xb)) @ w, y)
    )(w)
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref), rtol=1e-5)


def test_pgd_fwd_key_varies_per_iteration():
    """With fwd_key given, every PGD iteration calls forward with its own
    fold_in key (the reference resamples the regime draw via np.random on
    every model forward, mnist layers.py:27,33); a key-ignoring forward
    is bit-identical to the key-less path."""
    x = jnp.linspace(-0.2, 0.9, 12).reshape(3, 2, 2, 1)  # NHWC
    y = jnp.asarray([0, 1, 2])
    w = jnp.asarray(np.random.RandomState(0).randn(4, 3), jnp.float32)

    def fwd_plain(xi):
        return xi.reshape(xi.shape[0], -1) @ w

    def fwd_ignore_key(xi, k=None):
        return fwd_plain(xi)

    def fwd_keyed(xi, k=None):
        # key-dependent CLASS PERMUTATION stands in for switch-mode solver
        # draws (a mere logit scale wouldn't survive PGD's sign())
        shift = jax.random.randint(k, (), 0, 3) if k is not None else 0
        return jnp.roll(fwd_plain(xi), shift, axis=-1)

    key = jax.random.key(3)
    a = pgd(fwd_plain, key, x, y, 0.1, 0.02, 5)[0]
    b = pgd(fwd_ignore_key, key, x, y, 0.1, 0.02, 5,
            fwd_key=jax.random.key(9))[0]
    assert jnp.array_equal(a, b)  # key plumbing is a no-op for key-ignorers

    c = pgd(fwd_keyed, key, x, y, 0.1, 0.02, 5, fwd_key=jax.random.key(9))[0]
    d = pgd(fwd_keyed, key, x, y, 0.1, 0.02, 5, fwd_key=jax.random.key(10))[0]
    assert not jnp.array_equal(c, d)  # fwd_key reaches the forwards
