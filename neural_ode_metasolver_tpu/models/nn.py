"""Functional NN layer library (TPU-native, NHWC).

Design: a layer is a pair of pure functions — ``*_init(key, ...) -> params``
and an apply function ``f(params, x, ...) -> y``.  Parameters are nested dicts
of arrays; there is no module object, so the ODE-block RHS can be closed over
its params and handed straight to ``lax.scan`` inside the integrator with no
lifted-transform machinery.  Stateful layers (BatchNorm running stats,
SpectralNorm power-iteration vectors) thread an explicit ``state`` dict and
return an updated one.

Layout: activations are NHWC and conv kernels HWIO — the native layouts for
XLA:TPU convolutions (the reference is NCHW torch; the data layer transposes
once at the edge).  Under mixed precision (bf16 activations) kernels are cast
to the activation dtype; XLA:TPU accumulates bf16 matmuls/convs in f32 on the
MXU.

Initializers replicate torch defaults for numerics parity (SURVEY.md §7
"hard parts"): Conv2d/Linear kaiming-uniform(a=sqrt(5)) + fan-in-uniform bias,
plus the orthogonal inits used by the CIFAR runner
(odenet_cifar10/utils.py:87-94).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array
Params = Dict[str, Any]

__all__ = [
    "conv2d_init",
    "conv2d",
    "linear_init",
    "linear",
    "group_norm_init",
    "group_norm",
    "batch_norm_init",
    "batch_norm",
    "instance_norm",
    "get_activation",
    "NormDef",
    "make_norm_def",
    "ParamNormDef",
    "make_param_norm_def",
    "orthogonal_conv_init",
    "orthogonal_fc_init",
    "xavier_conv_init",
    "apply_init_scheme",
    "global_avg_pool",
]

# --------------------------------------------------------------------------
# Initializers (torch-default parity)
# --------------------------------------------------------------------------


def _kaiming_uniform(key, shape, fan_in, a=math.sqrt(5.0), dtype=jnp.float32):
    """torch.nn.init.kaiming_uniform_ with a=sqrt(5) reduces to
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — the torch Conv2d/Linear default."""
    gain = math.sqrt(2.0 / (1.0 + a * a))
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def conv2d_init(
    key: Array,
    in_ch: int,
    out_ch: int,
    ksize: int,
    use_bias: bool = True,
    dtype=jnp.float32,
) -> Params:
    """Conv kernel (H, W, I, O) + optional bias, torch-default init."""
    k_w, k_b = jax.random.split(key)
    fan_in = in_ch * ksize * ksize
    params: Params = {
        "kernel": _kaiming_uniform(
            k_w, (ksize, ksize, in_ch, out_ch), fan_in, dtype=dtype
        )
    }
    if use_bias:
        bound = 1.0 / math.sqrt(fan_in)
        params["bias"] = jax.random.uniform(
            k_b, (out_ch,), dtype, -bound, bound
        )
    return params


def conv2d(
    params: Params,
    x: Array,
    stride: int = 1,
    padding=0,
    dilation: int = 1,
    groups: int = 1,
) -> Array:
    """2-D convolution, NHWC x HWIO -> NHWC; integer padding is symmetric
    (torch-style)."""
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    kernel = params["kernel"]
    # No explicit preferred_element_type: XLA:TPU accumulates bf16 convs in
    # f32 on the MXU anyway, and a f32-preferred output breaks the conv
    # transpose rule under mixed precision (mixed-dtype cotangent).
    y = lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        rhs_dilation=(dilation, dilation),
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in params:
        y = y + params["bias"].astype(y.dtype)
    return y


def linear_init(
    key: Array, in_f: int, out_f: int, use_bias: bool = True, dtype=jnp.float32
) -> Params:
    k_w, k_b = jax.random.split(key)
    params: Params = {
        "kernel": _kaiming_uniform(k_w, (in_f, out_f), in_f, dtype=dtype)
    }
    if use_bias:
        bound = 1.0 / math.sqrt(in_f)
        params["bias"] = jax.random.uniform(k_b, (out_f,), dtype, -bound, bound)
    return params


def linear(params: Params, x: Array) -> Array:
    y = jnp.dot(x, params["kernel"].astype(x.dtype))
    if "bias" in params:
        y = y + params["bias"].astype(y.dtype)
    return y


def orthogonal_conv_init(key: Array, params: Params) -> Params:
    """Re-init a conv kernel orthogonally (odenet_cifar10/utils.py:87-89:
    torch orthogonal_ on the (O, I*H*W) matrix), keeping bias untouched."""
    kernel = params["kernel"]
    kh, kw, ci, co = kernel.shape
    flat = jax.nn.initializers.orthogonal()(key, (co, kh * kw * ci),
                                            kernel.dtype)
    new = flat.reshape(co, kh, kw, ci).transpose(1, 2, 3, 0)
    out = dict(params)
    out["kernel"] = new
    return out


def xavier_conv_init(key: Array, params: Params) -> Params:
    """Xavier-uniform(gain=sqrt(2)) conv re-init, zero bias — the reference's
    ``conv_init`` intent (odenet_cifar10/utils.py:78-85; its ``np`` import bug
    meant it could never run there)."""
    kernel = params["kernel"]
    kh, kw, ci, co = kernel.shape
    fan_in, fan_out = ci * kh * kw, co * kh * kw
    gain = math.sqrt(2.0)
    bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
    out = dict(params)
    out["kernel"] = jax.random.uniform(key, kernel.shape, kernel.dtype,
                                       -bound, bound)
    if "bias" in out:
        out["bias"] = jnp.zeros_like(out["bias"])
    return out


def apply_init_scheme(key: Array, params, scheme: str):
    """Walk a params tree re-initializing conv/linear kernels.

    ``scheme='orthogonal'``: orthogonal convs + orthogonal FC with bias=1e-3
    (cifar runner ``--init orthogonal``, train_and_attack.py:439-443);
    ``scheme='xavier'``: the conv_init variant above.
    """
    if scheme is None:
        return params
    if scheme not in ("orthogonal", "xavier"):
        # raise like the sibling string registries (make_norm_def,
        # get_activation) — a typo must not silently keep default init
        raise NameError(f"Unknown init scheme {scheme!r}")
    n_leaves = len(jax.tree_util.tree_leaves(params))
    keys = jax.random.split(key, max(n_leaves, 1))
    idx = [0]  # recursive walk: kernels need their sibling bias

    def walk(node):
        if isinstance(node, dict) and "kernel" in node:
            k = keys[idx[0] % len(keys)]
            idx[0] += 1
            if node["kernel"].ndim == 4:
                if scheme == "orthogonal":
                    return orthogonal_conv_init(k, node)
                if scheme == "xavier":
                    return xavier_conv_init(k, node)
            elif node["kernel"].ndim == 2 and scheme == "orthogonal":
                return orthogonal_fc_init(k, node)
            return node
        if isinstance(node, dict):
            return {kk: walk(v) for kk, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node

    return walk(params)


def orthogonal_fc_init(key: Array, params: Params) -> Params:
    """Orthogonal linear kernel + bias=1e-3 (odenet_cifar10/utils.py:91-94)."""
    inf, outf = params["kernel"].shape
    flat = jax.nn.initializers.orthogonal()(key, (outf, inf),
                                            params["kernel"].dtype)
    out = dict(params)
    out["kernel"] = flat.T
    if "bias" in out:
        out["bias"] = jnp.full_like(out["bias"], 1e-3)
    return out


# --------------------------------------------------------------------------
# Normalizations
# --------------------------------------------------------------------------


def group_norm_init(ch: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((ch,), dtype), "bias": jnp.zeros((ch,), dtype)}


def group_norm(
    params: Params, x: Array, num_groups: int, eps: float = 1e-5
) -> Array:
    """GroupNorm over NHWC (torch nn.GroupNorm parity: eps=1e-5, affine).

    Stats are computed in f32 regardless of compute dtype.
    """
    n, h, w, c = x.shape
    g = num_groups
    xf = x.astype(jnp.float32).reshape(n, h, w, g, c // g)
    mean = xf.mean(axis=(1, 2, 4), keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=(1, 2, 4), keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps)
    y = y.reshape(n, h, w, c)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(
        jnp.float32
    )
    return y.astype(x.dtype)


def batch_norm_init(ch: int, dtype=jnp.float32) -> Tuple[Params, Params]:
    params = {"scale": jnp.ones((ch,), dtype), "bias": jnp.zeros((ch,), dtype)}
    state = {
        "mean": jnp.zeros((ch,), jnp.float32),
        "var": jnp.ones((ch,), jnp.float32),
    }
    return params, state


def batch_norm(
    params: Params,
    state: Params,
    x: Array,
    train: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
) -> Tuple[Array, Params]:
    """BatchNorm2d parity (torch: momentum 0.1, unbiased running var)."""
    xf = x.astype(jnp.float32)
    if train:
        mean = xf.mean(axis=(0, 1, 2))
        var = ((xf - mean) ** 2).mean(axis=(0, 1, 2))
        n = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = var * n / max(n - 1, 1)
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (xf - mean) * lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(
        jnp.float32
    )
    return y.astype(x.dtype), new_state


def instance_norm(x: Array, eps: float = 1e-5) -> Array:
    """InstanceNorm2d parity (torch default: affine=False, no running stats)."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=(1, 2), keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=(1, 2), keepdims=True)
    return ((xf - mean) * lax.rsqrt(var + eps)).astype(x.dtype)


# --------------------------------------------------------------------------
# Registries (reference odenet_cifar10/utils.py:15-76)
# --------------------------------------------------------------------------


class NormDef:
    """A norm layer *kind* bound to its hyperparams; produces (init, apply).

    ``stateful`` marks kinds that thread running state (BN).  Apply signature
    is uniform: ``apply(params, state, x, train) -> (y, new_state)`` where
    params/state may be None for param-free kinds.
    """

    def __init__(self, kind: str, num_groups: int = 32):
        self.kind = kind
        self.num_groups = num_groups
        self.stateful = kind == "BN"
        self.has_params = kind in ("BN", "GN", "LN")

    def init(self, ch: int) -> Tuple[Optional[Params], Optional[Params]]:
        if self.kind == "BN":
            return batch_norm_init(ch)
        if self.kind in ("GN", "LN"):
            if self.kind == "GN" and ch % min(self.num_groups, ch) != 0:
                # torch nn.GroupNorm raises this at construction; without
                # it the failure is an opaque reshape error mid-forward
                raise ValueError(
                    f"num_channels {ch} must be divisible by num_groups "
                    f"{min(self.num_groups, ch)}"
                )
            return group_norm_init(ch), None
        return None, None  # IN, NF

    def apply(self, params, state, x, train: bool):
        if self.kind == "BN":
            return batch_norm(params, state, x, train)
        if self.kind == "GN":
            return group_norm(params, x, min(self.num_groups, x.shape[-1])), None
        if self.kind == "LN":
            return group_norm(params, x, 1), None
        if self.kind == "IN":
            return instance_norm(x), None
        if self.kind == "NF":
            return x, None
        raise NameError("Unknown layer normalization type")


def make_norm_def(key: str, num_groups: int = 32) -> NormDef:
    """String -> NormDef (reference get_normalization, utils.py:15-38)."""
    if key not in ("BN", "LN", "GN", "IN", "NF"):
        raise NameError("Unknown layer normalization type")
    return NormDef(key, num_groups)


# erf(x/sqrt2) ~= tanh(x * q(x^2)) with q a degree-4 polynomial (gelu-space
# minimax fit on [0,6]; leading coefficient > 0 so the tanh argument keeps
# growing and the form saturates correctly for ALL |x| — max |gelu error|
# beyond the fit range is 6e-9).  In f32 the max |gelu error| vs the exact
# erf form is 3.4e-6 and max grad error 1.5e-5 — two orders inside the
# repo's f32 forward-parity bar vs the reference's torch code (atol=3e-4,
# tests/test_torch_parity_cifar.py:115), i.e. parity-grade.  A degree-13
# Chebyshev/Clenshaw mul-add-only version hit the same accuracy but its 13
# serial recurrence steps MEASURED SLOWER than XLA's own erf on the chip
# (106 vs 84 ms/step); tanh is a fast native VPU transcendental, so riding
# it with a 5-term odd argument is both cheaper and kink-free (SCALING.md
# round-3 "erf-GELU tax").
_GELU_TANH_KERNEL_COEFFS = (
    0.7978281363504355, 0.036468789125448826, -0.0001248603561668213,
    -3.058127220985254e-05, 1.119098134045954e-06,
)


def gelu_poly(x: Array) -> Array:
    """Exact-erf GELU as 0.5*x*(1 + tanh(x*q(x^2))), q degree-4.

    Numerically the same function as ``jax.nn.gelu(approximate=False)``
    (max |diff| 3.4e-6, max grad diff 1.5e-5, in f32) but with the
    erf/erfc/exp chain replaced by one native-rate tanh plus 9 mul/adds —
    on TPU this sidesteps the VPU-transcendental tax that makes the exact
    erf form the flagship step's hotspot (SCALING.md round-3
    attribution).  Computed in the INPUT dtype: an f32-internal variant
    measured the same speed on chip (70.6 vs 69.6 ms/step), and at bf16
    inputs both GeLUpoly and the exact erf form are input-rounding
    dominated (3.1e-2 from the true GELU each — identical accuracy
    class), so the upcast buys nothing.  The accuracy numbers above are
    for f32 inputs.  |x| is clamped at 8 only to keep the polynomial
    argument tame in low-precision dtypes (erf(8/sqrt2) == 1 in f32).
    """
    t = jnp.clip(x, -8.0, 8.0)
    t2 = t * t
    cs = _GELU_TANH_KERNEL_COEFFS
    q = jnp.asarray(cs[-1], x.dtype)
    for c in cs[-2::-1]:
        q = q * t2 + jnp.asarray(c, x.dtype)
    phi = 0.5 * jnp.tanh(t * q) + 0.5
    return (x * phi).astype(x.dtype)


def get_activation(key: str) -> Callable[[Array], Array]:
    """String -> activation (reference get_activation, utils.py:57-76).

    'GeLU' is torch F.gelu default = exact (erf) gelu; 'AF' is
    leaky_relu(negative_slope=1) == identity.

    'GeLUtanh' (no reference counterpart; torch's gelu(approximate='tanh'))
    is a perf opt-in: the exact erf GELU + its grad are the flagship
    step's VPU-transcendental hotspot on TPU (SCALING.md round-3
    attribution), and the tanh form is measurably cheaper there.  Max
    |diff| vs exact is ~3e-4 around |x|~2 — NOT a parity activation.

    'GeLUpoly' (no reference counterpart) is the parity-grade fast form:
    the same mathematical function as 'GeLU' to 3.4e-6 (see gelu_poly),
    riding the fast native tanh instead of the slow erf chain.
    """
    if key == "ReLU":
        return jax.nn.relu
    if key == "GeLU":
        return partial(jax.nn.gelu, approximate=False)
    if key == "GeLUtanh":
        return partial(jax.nn.gelu, approximate=True)
    if key == "GeLUpoly":
        return gelu_poly
    if key == "Softsign":
        return jax.nn.soft_sign
    if key == "Tanh":
        return jnp.tanh
    if key == "AF":
        return lambda x: x  # leaky_relu with slope 1
    raise NameError("Unknown activation type")


# --------------------------------------------------------------------------
# Parameter normalization (spectral / weight norm)
# --------------------------------------------------------------------------


def _kernel_as_matrix(kernel: Array) -> Array:
    """HWIO conv kernel (or IO linear kernel) -> (O, rest) matrix, matching
    torch's dim=0-first reshape of the OIHW weight."""
    if kernel.ndim == 4:
        kh, kw, ci, co = kernel.shape
        return kernel.transpose(3, 2, 0, 1).reshape(co, ci * kh * kw)
    return kernel.T  # linear (I, O) -> (O, I)


class ParamNormDef:
    """Weight-normalization kind: 'SN' (spectral), 'WN' (weight), 'PNF' (none).

    ``wrap_init`` augments a conv/linear param dict with the reparametrization
    leaves; ``materialize`` produces the effective kernel (and, for SN in
    train mode, the updated power-iteration state).
    """

    def __init__(self, kind: str):
        if kind not in ("SN", "WN", "PNF"):
            raise NameError("Unknown param normalization type")
        self.kind = kind
        self.stateful = kind == "SN"

    def wrap_init(
        self, key: Array, params: Params
    ) -> Tuple[Params, Optional[Params]]:
        if self.kind == "PNF":
            return params, None
        kernel = params["kernel"]
        if self.kind == "WN":
            # torch weight_norm(dim=0): w = g * v/||v||, g0 = ||w0|| per out-ch
            mat = _kernel_as_matrix(kernel)
            g = jnp.linalg.norm(mat, axis=1)
            out = dict(params)
            out["wn_g"] = g.astype(kernel.dtype)
            return out, None
        # SN: persistent left singular vector estimate u
        mat = _kernel_as_matrix(kernel)
        u = jax.random.normal(key, (mat.shape[0],), jnp.float32)
        u = u / (jnp.linalg.norm(u) + 1e-12)
        return params, {"sn_u": u}

    def materialize(
        self, params: Params, state: Optional[Params], train: bool
    ) -> Tuple[Params, Optional[Params]]:
        if self.kind == "PNF":
            return params, state
        kernel = params["kernel"]
        mat = _kernel_as_matrix(kernel).astype(jnp.float32)
        if self.kind == "WN":
            norms = jnp.linalg.norm(mat, axis=1)
            scale = params["wn_g"].astype(jnp.float32) / (norms + 1e-12)
            if kernel.ndim == 4:
                new_kernel = kernel * scale.astype(kernel.dtype)[None, None, None, :]
            else:
                new_kernel = kernel * scale.astype(kernel.dtype)[None, :]
            out = {k: v for k, v in params.items() if k != "wn_g"}
            out["kernel"] = new_kernel
            return out, state
        # SN: one power iteration per train-mode forward (torch default)
        u = state["sn_u"]
        if train:
            v = mat.T @ u
            v = v / (jnp.linalg.norm(v) + 1e-12)
            u = mat @ v
            u = u / (jnp.linalg.norm(u) + 1e-12)
            u = lax.stop_gradient(u)
            v = lax.stop_gradient(v)
            new_state = {"sn_u": u}
        else:
            v = mat.T @ u
            v = v / (jnp.linalg.norm(v) + 1e-12)
            new_state = state
        sigma = u @ (mat @ v)
        out = dict(params)
        out["kernel"] = (kernel / sigma.astype(kernel.dtype))
        return out, new_state


def make_param_norm_def(key: str) -> ParamNormDef:
    return ParamNormDef(key)


# --------------------------------------------------------------------------
# Misc
# --------------------------------------------------------------------------


def global_avg_pool(x: Array) -> Array:
    """AdaptiveAvgPool2d((1,1)) + Flatten for NHWC."""
    return x.mean(axis=(1, 2))
