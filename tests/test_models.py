"""Model tests: shapes, jit/grad, regimes through models, and numerics parity
of the primitive layers against torch CPU (SURVEY.md §7 step 4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_ode_metasolver_tpu.models import (
    CifarConfig,
    MnistConfig,
    apply_cifar,
    apply_mnist,
    init_cifar,
    init_mnist,
    premetanode10,
    metanode6,
)
from neural_ode_metasolver_tpu.models import nn as fnn
from neural_ode_metasolver_tpu.ops import SolverOptions, create_solver

SOLVERS = [create_solver("rk2", "u", n_steps=2, u0=0.5)]
OPTS = SolverOptions()


def n_params(tree):
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


# ------------------------------------------------------------- MNIST ------


def test_mnist_forward_shape():
    cfg = MnistConfig()
    params = init_mnist(jax.random.key(0), cfg)
    x = jnp.ones((2, 28, 28, 1), jnp.float32)
    logits, aux = apply_mnist(params, x, SOLVERS, OPTS, cfg=cfg)
    assert logits.shape == (2, 10)
    assert aux["ss_loss"].shape == ()


def test_mnist_res_downsampling_and_resnet_mode():
    cfg = MnistConfig(downsampling_method="res", is_odenet=False)
    params = init_mnist(jax.random.key(0), cfg)
    x = jnp.ones((2, 28, 28, 1), jnp.float32)
    logits, _ = apply_mnist(params, x, cfg=cfg)
    assert logits.shape == (2, 10)


def test_mnist_param_count_matches_reference_scale():
    # Reference MNIST ODE-net ~208k params (conv downsampling).
    params = init_mnist(jax.random.key(0), MnistConfig())
    assert 150_000 < n_params(params) < 260_000


def test_mnist_jit_and_grad():
    cfg = MnistConfig()
    params = init_mnist(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (2, 28, 28, 1), jnp.float32)
    y = jnp.asarray([3, 7])

    @jax.jit
    def loss_fn(params, x, y):
        logits, aux = apply_mnist(params, x, SOLVERS, OPTS, cfg=cfg,
                                  ss_loss=True)
        ce = -jnp.mean(
            jax.nn.log_softmax(logits)[jnp.arange(2), y]
        )
        return ce + 0.1 * aux["ss_loss"]

    g = jax.grad(loss_fn)(params, x, y)
    gnorm = sum(
        float(jnp.sum(v**2)) for v in jax.tree_util.tree_leaves(g)
    )
    assert np.isfinite(gnorm) and gnorm > 0


def test_mnist_switch_and_ensemble_modes():
    cfg = MnistConfig()
    params = init_mnist(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (2, 28, 28, 1), jnp.float32)
    solvers = [
        create_solver("rk2", "u", n_steps=2, u0=0.5),
        create_solver("rk2", "u", n_steps=2, u0=1.0),
    ]
    for mode, kw in [
        ("switch", dict(switch_probs=[0.6, 0.4])),
        ("ensemble", dict(ensemble_prob=1.0, ensemble_weights=[0.6, 0.4])),
    ]:
        logits, _ = apply_mnist(
            params, x, solvers, SolverOptions(solver_mode=mode, **kw),
            cfg=cfg, key=jax.random.key(2),
        )
        assert logits.shape == (2, 10)
        assert np.isfinite(np.asarray(logits)).all()


# ------------------------------------------------------------- CIFAR ------


def test_cifar_premetanode10_shapes():
    cfg = premetanode10()
    params, state = init_cifar(jax.random.key(0), cfg)
    x = jnp.ones((2, 32, 32, 3), jnp.float32)
    logits, new_state, aux = apply_cifar(params, state, x, SOLVERS, OPTS,
                                         cfg=cfg)
    assert logits.shape == (2, 10)
    assert np.isfinite(np.asarray(logits)).all()


def test_cifar_resnet_mode():
    cfg = premetanode10(is_odenet=False)
    assert cfg.num_blocks == ((2, 0), (2, 0))
    params, state = init_cifar(jax.random.key(0), cfg)
    x = jnp.ones((2, 32, 32, 3), jnp.float32)
    logits, _, _ = apply_cifar(params, state, x, cfg=cfg)
    assert logits.shape == (2, 10)


def test_cifar_basic_block_variant():
    cfg = metanode6()
    params, state = init_cifar(jax.random.key(0), cfg)
    x = jnp.ones((2, 32, 32, 3), jnp.float32)
    logits, _, _ = apply_cifar(params, state, x, SOLVERS, OPTS, cfg=cfg)
    assert logits.shape == (2, 10)


def test_cifar_four_stage_variant():
    from neural_ode_metasolver_tpu.models import premetanode18

    cfg = premetanode18(in_planes=16)
    params, state = init_cifar(jax.random.key(0), cfg)
    x = jnp.ones((1, 32, 32, 3), jnp.float32)
    logits, _, _ = apply_cifar(params, state, x, SOLVERS, OPTS, cfg=cfg)
    assert logits.shape == (1, 10)


def test_cifar_norm_param_norm_registries():
    cfg = premetanode10(
        in_planes=16,
        norms=("GN", "GN", "BN"),
        num_gn_groups=8,
        param_norms=("WN", "SN", "PNF"),
        acts=("ReLU", "GeLU", "Tanh"),
    )
    params, state = init_cifar(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (4, 32, 32, 3), jnp.float32)
    logits, new_state, _ = apply_cifar(params, state, x, SOLVERS, OPTS,
                                       cfg=cfg, train=True)
    assert logits.shape == (4, 10)
    # BN running stats must have moved
    old = state["bn1"]["mean"]
    new = new_state["bn1"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))
    # SN state (power-iteration u) must have been updated in the ODE RHS conv
    u_old = state["layer1"]["ode"][0]["conv1"]["sn_u"]
    u_new = new_state["layer1"]["ode"][0]["conv1"]["sn_u"]
    assert not np.allclose(np.asarray(u_old), np.asarray(u_new))


def test_cifar_ss_loss_runs():
    cfg = premetanode10(in_planes=16)
    params, state = init_cifar(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3), jnp.float32)
    _, _, aux = apply_cifar(params, state, x, SOLVERS, OPTS, cfg=cfg,
                            ss_loss=True, ss_loss_abs=True)
    assert float(aux["ss_loss"]) > 0


def test_cifar_jit_grad():
    cfg = premetanode10(in_planes=16)
    params, state = init_cifar(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3), jnp.float32)
    y = jnp.asarray([0, 5])

    @jax.jit
    def loss_fn(params, x):
        logits, _, _ = apply_cifar(params, state, x, SOLVERS, OPTS, cfg=cfg,
                                   train=True)
        return -jnp.mean(jax.nn.log_softmax(logits)[jnp.arange(2), y])

    g = jax.grad(loss_fn)(params, x)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(v)).all() for v in leaves)
    assert any(float(jnp.abs(v).sum()) > 0 for v in leaves)


def test_preact_bug_flag_changes_dataflow():
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3), jnp.float32)
    cfg_f = premetanode10(in_planes=16, norms=("NF", "NF", "GN"))
    params, state = init_cifar(jax.random.key(0), cfg_f)
    out_f, _, _ = apply_cifar(params, state, x, SOLVERS, OPTS, cfg=cfg_f)
    cfg_i = premetanode10(in_planes=16, norms=("NF", "NF", "GN"),
                          faithful_preact_bug=False)
    params_i, state_i = init_cifar(jax.random.key(0), cfg_i)  # epilogue-sized bn1
    out_i, _, _ = apply_cifar(params_i, state_i, x, SOLVERS, OPTS, cfg=cfg_i)
    assert not np.allclose(np.asarray(out_f), np.asarray(out_i))


# ------------------------------------------------- torch numerics parity --


torch = pytest.importorskip("torch")


def to_torch_nchw(x):
    return torch.tensor(np.asarray(x).transpose(0, 3, 1, 2))


def test_conv2d_matches_torch():
    key = jax.random.key(0)
    p = fnn.conv2d_init(key, 5, 7, 3)
    x = jax.random.normal(jax.random.key(1), (2, 9, 9, 5), jnp.float32)
    y = fnn.conv2d(p, x, stride=2, padding=1)

    conv = torch.nn.Conv2d(5, 7, 3, stride=2, padding=1)
    with torch.no_grad():
        conv.weight.copy_(
            torch.tensor(np.asarray(p["kernel"]).transpose(3, 2, 0, 1))
        )
        conv.bias.copy_(torch.tensor(np.asarray(p["bias"])))
        yt = conv(to_torch_nchw(x)).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(y), yt, atol=2e-5)


def test_group_norm_matches_torch():
    p = fnn.group_norm_init(32)
    p = {
        "scale": jax.random.uniform(jax.random.key(0), (32,)) + 0.5,
        "bias": jax.random.normal(jax.random.key(1), (32,)),
    }
    x = jax.random.normal(jax.random.key(2), (2, 5, 5, 32), jnp.float32)
    y = fnn.group_norm(p, x, num_groups=8)

    gn = torch.nn.GroupNorm(8, 32)
    with torch.no_grad():
        gn.weight.copy_(torch.tensor(np.asarray(p["scale"])))
        gn.bias.copy_(torch.tensor(np.asarray(p["bias"])))
        yt = gn(to_torch_nchw(x)).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(y), yt, atol=2e-5)


def test_batch_norm_matches_torch():
    p, s = fnn.batch_norm_init(6)
    x = jax.random.normal(jax.random.key(0), (4, 3, 3, 6), jnp.float32) * 2 + 1
    y, s2 = fnn.batch_norm(p, s, x, train=True)

    bn = torch.nn.BatchNorm2d(6)
    xt = to_torch_nchw(x)
    yt = bn(xt).detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(y), yt, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(s2["mean"]), bn.running_mean.numpy(), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(s2["var"]), bn.running_var.numpy(), atol=2e-5
    )
    # eval mode consumes running stats
    y_eval, _ = fnn.batch_norm(p, s2, x, train=False)
    bn.eval()
    yt_eval = bn(xt).detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(y_eval), yt_eval, atol=2e-5)


def test_gelu_matches_torch():
    x = jnp.linspace(-4, 4, 101, dtype=jnp.float32)
    y = fnn.get_activation("GeLU")(x)
    yt = torch.nn.functional.gelu(torch.tensor(np.asarray(x))).numpy()
    np.testing.assert_allclose(np.asarray(y), yt, atol=1e-6)


def test_weight_norm_matches_torch():
    pn = fnn.make_param_norm_def("WN")
    key = jax.random.key(0)
    p = fnn.conv2d_init(key, 4, 6, 3, use_bias=False)
    p_wn, _ = pn.wrap_init(jax.random.key(1), p)
    # perturb g to exercise the reparametrization
    p_wn["wn_g"] = p_wn["wn_g"] * 1.7
    p_eff, _ = pn.materialize(p_wn, None, train=True)
    x = jax.random.normal(jax.random.key(2), (2, 8, 8, 4), jnp.float32)
    y = fnn.conv2d(p_eff, x, padding=1)

    conv = torch.nn.Conv2d(4, 6, 3, padding=1, bias=False)
    with torch.no_grad():
        conv.weight.copy_(
            torch.tensor(np.asarray(p["kernel"]).transpose(3, 2, 0, 1))
        )
    conv = torch.nn.utils.weight_norm(conv)
    with torch.no_grad():
        conv.weight_g.copy_(conv.weight_g * 1.7)
        yt = conv(to_torch_nchw(x)).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(y), yt, atol=3e-5)


def test_spectral_norm_normalizes_sigma():
    pn = fnn.make_param_norm_def("SN")
    p = fnn.conv2d_init(jax.random.key(0), 8, 8, 3, use_bias=False)
    p_sn, st = pn.wrap_init(jax.random.key(1), p)
    # run power iteration to convergence
    for _ in range(50):
        p_eff, st = pn.materialize(p_sn, st, train=True)
    mat = np.asarray(p_eff["kernel"]).transpose(3, 2, 0, 1).reshape(8, -1)
    sigma = np.linalg.svd(mat, compute_uv=False)[0]
    np.testing.assert_allclose(sigma, 1.0, atol=1e-3)


def test_mnist_odefunc_matches_torch_reference_structure():
    """Full RHS parity: GN-ReLU-ConcatConv-GN-ReLU-ConcatConv-GN with
    identical weights must match a torch replica of ODEfunc
    (odenet_mnist/layers.py:134-171)."""
    from neural_ode_metasolver_tpu.models.odenet_mnist import (
        _odefunc_apply,
        _odefunc_init,
    )

    dim = 16
    params = _odefunc_init(jax.random.key(0), dim)
    x = jax.random.normal(jax.random.key(1), (2, 6, 6, dim), jnp.float32)
    t = jnp.float32(0.37)
    y = _odefunc_apply(params, t, x, jax.nn.relu)

    g = min(32, dim)

    class TorchODEfunc(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = torch.nn.GroupNorm(g, dim)
            self.conv1 = torch.nn.Conv2d(dim + 1, dim, 3, 1, 1)
            self.norm2 = torch.nn.GroupNorm(g, dim)
            self.conv2 = torch.nn.Conv2d(dim + 1, dim, 3, 1, 1)
            self.norm3 = torch.nn.GroupNorm(g, dim)

        def forward(self, t, x):
            def cc(conv, t, x):
                tt = torch.ones_like(x[:, :1]) * t
                return conv(torch.cat([tt, x], 1))

            out = torch.relu(self.norm1(x))
            out = cc(self.conv1, t, out)
            out = torch.relu(self.norm2(out))
            out = cc(self.conv2, t, out)
            return self.norm3(out)

    m = TorchODEfunc()
    with torch.no_grad():
        for tname, jname in [("conv1", "conv1"), ("conv2", "conv2")]:
            conv = getattr(m, tname)
            conv.weight.copy_(
                torch.tensor(
                    np.asarray(params[jname]["kernel"]).transpose(3, 2, 0, 1)
                )
            )
            conv.bias.copy_(torch.tensor(np.asarray(params[jname]["bias"])))
        for nname in ["norm1", "norm2", "norm3"]:
            gn = getattr(m, nname)
            gn.weight.copy_(torch.tensor(np.asarray(params[nname]["scale"])))
            gn.bias.copy_(torch.tensor(np.asarray(params[nname]["bias"])))
        yt = (
            m(torch.tensor(0.37), to_torch_nchw(x))
            .numpy()
            .transpose(0, 2, 3, 1)
        )
    np.testing.assert_allclose(np.asarray(y), yt, atol=5e-5)


def test_switch_mode_with_ss_loss_replays_choice():
    """Reference quirk 5: switch + ss_loss raises NameError there; here the
    ss pass must replay the forward's sampled solver id."""
    cfg = MnistConfig(dim=16)
    params = init_mnist(jax.random.key(0), cfg)
    solvers = [
        create_solver("rk2", "u", n_steps=2, u0=0.5),
        create_solver("rk2", "u", n_steps=2, u0=1.0),
    ]
    x = jax.random.normal(jax.random.key(1), (2, 28, 28, 1), jnp.float32)
    logits, aux = apply_mnist(
        params, x, solvers,
        SolverOptions(solver_mode="switch", switch_probs=[0.5, 0.5]),
        cfg=cfg, key=jax.random.key(3), ss_loss=True,
    )
    assert np.isfinite(np.asarray(logits)).all()
    assert float(aux["ss_loss"]) > 0


def test_euler_through_model():
    cfg = MnistConfig(dim=16)
    params = init_mnist(jax.random.key(0), cfg)
    from neural_ode_metasolver_tpu.ops import create_solver as cs

    solvers = [cs("euler", None, n_steps=4)]
    x = jnp.ones((2, 28, 28, 1), jnp.float32)
    logits, _ = apply_mnist(params, x, solvers, SolverOptions(), cfg=cfg)
    assert logits.shape == (2, 10)
    assert np.isfinite(np.asarray(logits)).all()


def test_heterogeneous_switch_through_model():
    """Switching across different solver families (rk2 vs rk4 with different
    step counts) under jit — the lax.switch heterogeneous-branch path."""
    cfg = MnistConfig(dim=16)
    params = init_mnist(jax.random.key(0), cfg)
    solvers = [
        create_solver("rk2", "u", n_steps=2, u0=0.5),
        create_solver("rk4", "u2", n_steps=1, u0=1 / 3),
        create_solver("euler", None, n_steps=4),
    ]
    x = jax.random.normal(jax.random.key(1), (2, 28, 28, 1), jnp.float32)

    @jax.jit
    def run(params, x, key):
        logits, _ = apply_mnist(
            params, x, solvers,
            SolverOptions(solver_mode="switch",
                          switch_probs=[0.4, 0.3, 0.3]),
            cfg=cfg, key=key,
        )
        return logits

    outs = set()
    for i in range(6):
        logits = run(params, x, jax.random.key(i))
        assert np.isfinite(np.asarray(logits)).all()
        outs.add(round(float(logits[0, 0]), 6))
    assert len(outs) > 1  # different solvers actually get selected


def test_model_apply_defaults_give_clear_errors():
    """Model.apply with no solvers on an ODE config raises an actionable
    ValueError; solver_options=None means the default SolverOptions()."""
    from neural_ode_metasolver_tpu.models.api import build_model
    from neural_ode_metasolver_tpu.ops import create_solver

    model = build_model("mnist", dim=8)
    params, state = model.init(jax.random.key(0))
    x = jnp.zeros((2, 28, 28, 1))
    with pytest.raises(ValueError, match="pass solvers"):
        model.apply(params, state, x)
    s = create_solver("rk2", "u", n_steps=2, u0=0.5)
    logits, _, _ = model.apply(params, state, x, [s])  # options defaulted
    assert logits.shape == (2, 10)
    # resnet-mode configs don't need solvers at all
    res = build_model("mnist", dim=8, is_odenet=False)
    rp, rs = res.init(jax.random.key(1))
    logits, _, _ = res.apply(rp, rs, x)
    assert logits.shape == (2, 10)
