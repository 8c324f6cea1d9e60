"""Pallas fused GroupNorm+activation kernel tests (interpret mode on CPU;
the real-TPU path is exercised by scripts/pallas_tpu_check.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_ode_metasolver_tpu.models import nn as fnn
from neural_ode_metasolver_tpu.ops.pallas_kernels import (
    fused_group_norm_act,
    group_norm_reference,
)


def make_inputs(n=2, h=6, w=6, c=64, seed=0):
    kx, ks, kb = jax.random.split(jax.random.key(seed), 3)
    x = jax.random.normal(kx, (n, h, w, c), jnp.float32) * 2 + 0.5
    scale = jax.random.uniform(ks, (c,), jnp.float32) + 0.5
    bias = jax.random.normal(kb, (c,), jnp.float32)
    return x, scale, bias


@pytest.mark.parametrize("act", [None, "relu", "gelu"])
@pytest.mark.parametrize("groups", [8, 32])
def test_fused_gn_matches_reference(act, groups):
    x, scale, bias = make_inputs()
    out = fused_group_norm_act(x, scale, bias, groups, 1e-5, act,
                               True)  # interpret
    ref = group_norm_reference(x, scale, bias, groups, 1e-5, act)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_fused_gn_matches_nn_group_norm():
    x, scale, bias = make_inputs(c=32)
    out = fused_group_norm_act(x, scale, bias, 8, 1e-5, None, True)
    ref = fnn.group_norm({"scale": scale, "bias": bias}, x, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


@pytest.mark.parametrize("act", [None, "relu", "gelu"])
def test_fused_gn_grad_matches_reference(act):
    x, scale, bias = make_inputs(n=2, h=4, w=4, c=16)

    def loss_fused(x, scale, bias):
        out = fused_group_norm_act(x, scale, bias, 4, 1e-5, act, True)
        return jnp.sum(out * jnp.cos(out))

    def loss_ref(x, scale, bias):
        out = group_norm_reference(x, scale, bias, 4, 1e-5, act)
        return jnp.sum(out * jnp.cos(out))

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                   rtol=5e-4)


def test_fused_gn_bf16_io():
    x, scale, bias = make_inputs()
    out = fused_group_norm_act(x.astype(jnp.bfloat16), scale, bias, 8, 1e-5,
                               "relu", True)
    assert out.dtype == jnp.bfloat16
    ref = group_norm_reference(x.astype(jnp.bfloat16), scale, bias, 8, 1e-5,
                               "relu")
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )


def test_im2col_gemm_conv_matches_xla():
    """Aligned im2col/GEMM conv (ops/pallas_im2col.py): interpret-mode
    numerics vs the XLA conv emitter, incl. the K/Cout 128-padding."""
    import numpy as np

    from neural_ode_metasolver_tpu.ops.pallas_im2col import (
        conv3x3_im2col_gemm,
        reference_conv3x3,
    )

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 8, 8, 24).astype(np.float32))
    w = jnp.asarray((rs.randn(3, 3, 24, 40) * 0.1).astype(np.float32))
    ref = reference_conv3x3(x, w)
    got = conv3x3_im2col_gemm(x, w, m_tile=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5)
