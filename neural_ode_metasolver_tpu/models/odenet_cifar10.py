"""CIFAR-10 MetaNODE family: metanode4..34 / premetanode4..34.

Re-design of ``sopa/src/models/odenet_cifar10/layers.py`` as pure init/apply
functions with explicit (params, state) threading.  Architecture parity:

  conv1 (3 -> in_planes, k3 s1 p1, no bias, param-normed) -> [act(bn1)] ->
  up to 4 MetaLayers (strides 1,2,2,2; widths x1,2,4,8; each = res blocks then
  meta-ODE blocks) -> AvgPool(1,1) -> Flatten -> Linear            (:317-426)

  BasicBlock     conv-norm-act x2 + shortcut, post-act         (:22-51)
  PreBasicBlock  norm-act-conv x2 + conv shortcut              (:54-81)
  BasicBlock2    (ODE RHS) conv-norm-act x2; *ignores t*       (:84-121)
  PreBasicBlock2 (ODE RHS) norm-act-conv x2; *ignores t*       (:124-161)

Pluggable registries (odenet_cifar10/utils.py): norm BN/GN/LN/IN/NF,
param-norm SN/WN/PNF, activation ReLU/GeLU/Softsign/Tanh/AF, each configured
independently for the (resblock, odeblock, bn1) slots.  Flagship defaults
(train_and_attack.py:161-182): NF norms, PNF param-norms, GeLU activations.

Faithful-behavior decisions (SURVEY.md §7 "hard parts", quirks 6-8):
  * ``is_preactivation`` is always False in the reference (isinstance called
    on a class object, layers.py:339-342), so every published checkpoint ran
    act(bn1(conv1(x))) up front and no pre-act epilogue.
    ``faithful_preact_bug=True`` (default) matches that; False enables the
    intended pre-activation data flow.
  * The reference's CIFAR ``ss_loss`` raises NameError if called (missing
    ``partial`` import, quirk 6); here it simply works, with
    ``ss_loss_abs=False`` matching the (dead) executed-behavior default.
  * Norm layers *inside the ODE RHS*: BN would need running-stat updates
    inside the integration scan; since within one solve the statistics are
    those of a single batch, RHS-slot BN uses batch statistics with no
    running-state update (the reference comments BN "doesn't work with our
    method", layers.py:98, and no published config uses it there).
  * SpectralNorm power iteration runs once per block forward (kernel is
    constant within a solve), not once per RHS call as torch would.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.regimes import SolverOptions, meta_integrate
from . import nn as fnn
from .nn import NormDef, ParamNormDef, make_norm_def, make_param_norm_def

Array = jax.Array
Params = Dict[str, Any]
State = Dict[str, Any]


@dataclass(frozen=True)
class CifarConfig:
    """Static architecture configuration (slot order: resblock, odeblock, bn1,
    matching the reference's 3-tuples)."""

    num_blocks: Tuple[Tuple[int, int], ...] = ((1, 1), (1, 1))
    block_type: str = "prebasic"  # 'basic' | 'prebasic'
    num_classes: int = 10
    in_planes: int = 64
    norms: Tuple[str, str, str] = ("NF", "NF", "NF")
    num_gn_groups: int = 32
    param_norms: Tuple[str, str, str] = ("PNF", "PNF", "PNF")
    acts: Tuple[str, str, str] = ("GeLU", "GeLU", "GeLU")
    faithful_preact_bug: bool = True
    is_odenet: bool = True

    def norm_def(self, slot: int) -> NormDef:
        return make_norm_def(self.norms[slot], self.num_gn_groups)

    def pn_def(self, slot: int) -> ParamNormDef:
        return make_param_norm_def(self.param_norms[slot])

    def act(self, slot: int):
        return fnn.get_activation(self.acts[slot])


# ------------------------------------------------------- param-norm convs --


def _pn_conv_init(key, pn: ParamNormDef, in_ch, out_ch, k) -> Tuple[Params, Any]:
    k1, k2 = jax.random.split(key)
    params = fnn.conv2d_init(k1, in_ch, out_ch, k, use_bias=False)
    return pn.wrap_init(k2, params)


def _pn_conv(pn, params, st, x, stride, padding, train):
    p_eff, st2 = pn.materialize(params, st, train)
    return fnn.conv2d(p_eff, x, stride=stride, padding=padding), st2


# ------------------------------------------------------------- res blocks --


def _basic_block_init(key, cfg, in_planes, planes, stride):
    nd, pnd = cfg.norm_def(0), cfg.pn_def(0)
    ks = jax.random.split(key, 3)
    p: Params = {}
    s: State = {}
    p["conv1"], s["conv1"] = _pn_conv_init(ks[0], pnd, in_planes, planes, 3)
    p["bn1"], s["bn1"] = nd.init(planes)
    p["conv2"], s["conv2"] = _pn_conv_init(ks[1], pnd, planes, planes, 3)
    p["bn2"], s["bn2"] = nd.init(planes)
    if stride != 1 or in_planes != planes:
        p["sc_conv"], s["sc_conv"] = _pn_conv_init(ks[2], pnd, in_planes,
                                                   planes, 1)
        if cfg.block_type == "basic":  # BasicBlock shortcut has a norm too
            p["sc_bn"], s["sc_bn"] = nd.init(planes)
    return p, s


def _basic_block_apply(cfg, p, s, x, stride, train):
    """BasicBlock (layers.py:46-51): post-activation residual block."""
    nd, pnd, act = cfg.norm_def(0), cfg.pn_def(0), cfg.act(0)
    s = dict(s)
    out, s["conv1"] = _pn_conv(pnd, p["conv1"], s.get("conv1"), x, stride, 1,
                               train)
    out, s["bn1"] = nd.apply(p.get("bn1"), s.get("bn1"), out, train)
    out = act(out)
    out, s["conv2"] = _pn_conv(pnd, p["conv2"], s.get("conv2"), out, 1, 1,
                               train)
    out, s["bn2"] = nd.apply(p.get("bn2"), s.get("bn2"), out, train)
    shortcut = x
    if "sc_conv" in p:
        shortcut, s["sc_conv"] = _pn_conv(pnd, p["sc_conv"], s.get("sc_conv"),
                                          x, stride, 0, train)
        shortcut, s["sc_bn"] = nd.apply(p.get("sc_bn"), s.get("sc_bn"),
                                        shortcut, train)
    out = out + shortcut
    return act(out), s


def _pre_block_apply(cfg, p, s, x, stride, train):
    """PreBasicBlock (layers.py:77-81): pre-activation residual block."""
    nd, pnd, act = cfg.norm_def(0), cfg.pn_def(0), cfg.act(0)
    s = dict(s)
    out, s["bn1"] = nd.apply(p.get("bn1"), s.get("bn1"), x, train)
    out = act(out)
    out, s["conv1"] = _pn_conv(pnd, p["conv1"], s.get("conv1"), out, stride, 1,
                               train)
    out, s["bn2"] = nd.apply(p.get("bn2"), s.get("bn2"), out, train)
    out = act(out)
    out, s["conv2"] = _pn_conv(pnd, p["conv2"], s.get("conv2"), out, 1, 1,
                               train)
    shortcut = x
    if "sc_conv" in p:
        shortcut, s["sc_conv"] = _pn_conv(pnd, p["sc_conv"], s.get("sc_conv"),
                                          x, stride, 0, train)
    return out + shortcut, s


def _pre_block_init(key, cfg, in_planes, planes, stride):
    nd, pnd = cfg.norm_def(0), cfg.pn_def(0)
    ks = jax.random.split(key, 3)
    p: Params = {}
    s: State = {}
    p["bn1"], s["bn1"] = nd.init(in_planes)
    p["conv1"], s["conv1"] = _pn_conv_init(ks[0], pnd, in_planes, planes, 3)
    p["bn2"], s["bn2"] = nd.init(planes)
    p["conv2"], s["conv2"] = _pn_conv_init(ks[1], pnd, planes, planes, 3)
    if stride != 1 or in_planes != planes:
        p["sc_conv"], s["sc_conv"] = _pn_conv_init(ks[2], pnd, in_planes,
                                                   planes, 1)
    return p, s


def _resblock_init(key, cfg, in_planes, planes, stride):
    if cfg.block_type == "basic":
        return _basic_block_init(key, cfg, in_planes, planes, stride)
    return _pre_block_init(key, cfg, in_planes, planes, stride)


def _resblock_apply(cfg, p, s, x, stride, train):
    if cfg.block_type == "basic":
        return _basic_block_apply(cfg, p, s, x, stride, train)
    return _pre_block_apply(cfg, p, s, x, stride, train)


# --------------------------------------------------------------- ODE RHS --


def _odefunc_init(key, cfg, dim):
    nd, pnd = cfg.norm_def(1), cfg.pn_def(1)
    ks = jax.random.split(key, 2)
    p: Params = {}
    s: State = {}
    p["conv1"], s["conv1"] = _pn_conv_init(ks[0], pnd, dim, dim, 3)
    p["bn1"], s["bn1"] = nd.init(dim)
    p["conv2"], s["conv2"] = _pn_conv_init(ks[1], pnd, dim, dim, 3)
    p["bn2"], s["bn2"] = nd.init(dim)
    return p, s


def _rhs_norm(nd: NormDef, params, x):
    """Stateless norm application inside the RHS: BN falls back to batch
    statistics (see module docstring)."""
    if nd.kind == "BN":
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=(0, 1, 2))
        var = ((xf - mean) ** 2).mean(axis=(0, 1, 2))
        y = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
        y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(
            jnp.float32
        )
        return y.astype(x.dtype)
    y, _ = nd.apply(params, None, x, train=False)
    return y


def _materialize_odefunc(cfg, p, s, train):
    """Apply param-norm once per solve; returns effective conv params +
    updated SN state."""
    pnd = cfg.pn_def(1)
    s = dict(s)
    c1, s["conv1"] = pnd.materialize(p["conv1"], s.get("conv1"), train)
    c2, s["conv2"] = pnd.materialize(p["conv2"], s.get("conv2"), train)
    return {**p, "conv1": c1, "conv2": c2}, s


def _odefunc_apply(cfg, p_eff, t, x, ss_abs=False):
    """RHS evaluation (t is unused — the CIFAR RHS is autonomous, matching
    BasicBlock2/PreBasicBlock2 which ignore their t argument)."""
    del t
    nd, act = cfg.norm_def(1), cfg.act(1)
    if cfg.block_type == "basic":  # BasicBlock2 (:108-121)
        out = fnn.conv2d(p_eff["conv1"], x, stride=1, padding=1)
        out = _rhs_norm(nd, p_eff.get("bn1"), out)
        out = act(out)
        out = fnn.conv2d(p_eff["conv2"], out, stride=1, padding=1)
        out = _rhs_norm(nd, p_eff.get("bn2"), out)
        out = act(out)
    else:  # PreBasicBlock2 (:148-161)
        out = _rhs_norm(nd, p_eff.get("bn1"), x)
        out = act(out)
        out = fnn.conv2d(p_eff["conv1"], out, stride=1, padding=1)
        out = _rhs_norm(nd, p_eff.get("bn2"), out)
        out = act(out)
        out = fnn.conv2d(p_eff["conv2"], out, stride=1, padding=1)
    if ss_abs:
        out = jnp.abs(out)
    return out


# -------------------------------------------------------------- MetaLayer --


def _meta_layer_init(key, cfg, planes, num_blocks, stride, in_planes):
    num_res, num_ode = num_blocks
    strides = [stride] + [1] * (num_res + num_ode - 1)
    keys = jax.random.split(key, num_res + num_ode + 1)
    p: Params = {"res": [], "ode": []}
    s: State = {"res": [], "ode": []}
    cur = in_planes
    for i, st_ in enumerate(strides[:num_res]):
        bp, bs = _resblock_init(keys[i], cfg, cur, planes, st_)
        p["res"].append(bp)
        s["res"].append(bs)
        cur = planes
    for i in range(num_ode):
        bp, bs = _odefunc_init(keys[num_res + i], cfg, cur)
        p["ode"].append(bp)
        s["ode"].append(bs)
    return p, s, cur, strides


def _pipeline_ode_blocks(
    cfg, p_effs, bkeys, x, solvers, solver_options, remat, unroll, pipeline
):
    """Route a layer's same-shape ODE-block stack through GPipe
    (parallel/pipeline.py): consecutive blocks grouped into
    ``len(p_effs) // stages`` per stage, composed in sequential order, so
    the result equals the Python loop bit-for-bit up to reduction order
    (asserted in tests/test_parallel.py pp-parity tests)."""
    from ..parallel.pipeline import pipeline_apply, stack_stage_params

    S = pipeline.stages
    per = len(p_effs) // S

    def group(tree):
        # (n_blocks, ...) -> (S, per, ...): stage-major grouping of the
        # block axis produced by stack_stage_params
        return jax.tree_util.tree_map(
            lambda l: l.reshape(S, per, *l.shape[1:]), tree
        )

    stage_tree = {"p": group(stack_stage_params(p_effs))}
    if bkeys is not None:
        stage_tree["k"] = group(jnp.stack(bkeys))

    def body(stage, x_mb):
        for j in range(per):
            pj = jax.tree_util.tree_map(lambda l: l[j], stage["p"])
            kj = stage["k"][j] if "k" in stage else None
            rhs = lambda t, y, _p=pj: _odefunc_apply(cfg, _p, t, y)
            x_mb, _ = meta_integrate(
                solvers, rhs, x_mb, solver_options, kj,
                remat=remat, unroll=unroll,
            )
        return x_mb

    return pipeline_apply(
        body, stage_tree, x, pipeline.mesh,
        axis=pipeline.axis, n_microbatches=pipeline.microbatches,
        batch_axis=pipeline.batch_axis,
    )


def _meta_layer_apply(
    cfg, p, s, x, strides, solvers, solver_options, key, train,
    ss_loss, ss_loss_abs, remat, unroll, integration_method="backprop",
    pipeline=None,
):
    s = {"res": list(s["res"]), "ode": list(s["ode"])}
    for i, bp in enumerate(p["res"]):
        x, s["res"][i] = _resblock_apply(cfg, bp, s["res"][i], x, strides[i],
                                         train)
    ss_total = jnp.zeros((), x.dtype)

    num_ode = len(p["ode"])
    use_pp = (
        pipeline is not None
        and num_ode > 1
        and num_ode % pipeline.stages == 0
        # ss-loss replay and the adjoint path keep the sequential loop
        # (per-block aux threading / custom_vjp don't compose with the
        # shard_map schedule); both fall back transparently — as do
        # indivisible batches (eval tail batches under drop_last=False):
        # both the microbatch split AND each microbatch's shard over the
        # batch axis must divide evenly, or shard_map would reject the
        # tail mid-epoch instead of falling back
        and not ss_loss
        and integration_method == "backprop"
        and x.shape[0] % pipeline.microbatches == 0
        and (pipeline.batch_axis is None
             or (x.shape[0] // pipeline.microbatches)
             % pipeline.mesh.shape[pipeline.batch_axis] == 0)
    )
    if use_pp:
        p_effs = []
        for i, bp in enumerate(p["ode"]):
            p_eff, s["ode"][i] = _materialize_odefunc(
                cfg, bp, s["ode"][i], train
            )
            p_effs.append(p_eff)
        bkeys = None
        if key is not None:
            ks = []
            for _ in range(num_ode):
                key, bkey = jax.random.split(key)
                ks.append(bkey)
            bkeys = ks
        x = _pipeline_ode_blocks(
            cfg, p_effs, bkeys, x, solvers, solver_options, remat, unroll,
            pipeline,
        )
        return x, s, ss_total

    for i, bp in enumerate(p["ode"]):
        p_eff, s["ode"][i] = _materialize_odefunc(cfg, bp, s["ode"][i], train)
        rhs = lambda t, y, _p=p_eff: _odefunc_apply(cfg, _p, t, y)
        bkey = None
        if key is not None:
            key, bkey = jax.random.split(key)
        x, aux = meta_integrate(
            solvers, rhs, x, solver_options, bkey, remat=remat, unroll=unroll,
            adjoint=integration_method == "adjoint",
            rhs_params=p_eff,
            rhs_with_params=lambda pp, t, y: _odefunc_apply(cfg, pp, t, y),
        )
        if ss_loss:
            rhs_ss = lambda t, y, _p=p_eff: _odefunc_apply(
                cfg, _p, t, y, ss_abs=ss_loss_abs
            )
            z, _ = meta_integrate(
                solvers, rhs_ss, x, solver_options, None,
                t0=1.0, t1=2.0, aux_in=aux, remat=remat, unroll=unroll,
            )
            # f32 reduction: the squared-sum over ~HW*C elements loses
            # mantissa badly in bf16 (torch reference reduces in f32)
            diff = (z - x).reshape(x.shape[0], -1).astype(jnp.float32)
            ss_total = ss_total + jnp.mean(
                jnp.linalg.norm(diff, axis=1)
            ).astype(ss_total.dtype)
    return x, s, ss_total


# ----------------------------------------------------------------- model --


def init_cifar(key: Array, cfg: CifarConfig = CifarConfig()):
    """Initialize params and state; returns ``(params, state)``."""
    n_layers = len(cfg.num_blocks)
    keys = jax.random.split(key, n_layers + 3)
    nd_bn1, pnd_bn1 = cfg.norm_def(2), cfg.pn_def(2)

    p: Params = {}
    s: State = {}
    p["conv1"], s["conv1"] = _pn_conv_init(keys[0], pnd_bn1, 3, cfg.in_planes,
                                           3)
    # In the intended (non-faithful) pre-activation dataflow, bn1 runs as an
    # epilogue on the *final* feature map, so it must be sized for the final
    # width (the reference sizes it for in_planes, which would crash for any
    # multi-stage net if its isinstance bug were fixed — layers.py:345,422).
    if cfg.block_type == "prebasic" and not cfg.faithful_preact_bug:
        bn1_ch = cfg.in_planes * (2 ** max(len(cfg.num_blocks) - 1, 0))
    else:
        bn1_ch = cfg.in_planes
    p["bn1"], s["bn1"] = nd_bn1.init(bn1_ch)

    in_planes = cfg.in_planes
    n_features = cfg.in_planes
    for li in range(n_layers):
        planes = cfg.in_planes * (2 ** li)
        stride = 1 if li == 0 else 2
        # per-block strides are re-derived by apply via _layer_strides —
        # one canonical source of truth
        lp, ls, in_planes, _ = _meta_layer_init(
            keys[1 + li], cfg, planes, cfg.num_blocks[li], stride, in_planes
        )
        p[f"layer{li + 1}"] = lp
        s[f"layer{li + 1}"] = ls
        if li >= 1:
            n_features *= 2

    p["fc"] = fnn.linear_init(keys[-1], n_features, cfg.num_classes)
    return p, s


def _layer_strides(cfg: CifarConfig, li: int):
    num_res, num_ode = cfg.num_blocks[li]
    stride = 1 if li == 0 else 2
    return [stride] + [1] * (num_res + num_ode - 1)


def apply_cifar(
    params: Params,
    state: State,
    x: Array,
    solvers: Optional[Sequence] = None,
    solver_options: SolverOptions = SolverOptions(),
    *,
    cfg: CifarConfig = CifarConfig(),
    key: Optional[Array] = None,
    train: bool = False,
    ss_loss: bool = False,
    ss_loss_abs: bool = False,
    remat: bool = False,
    unroll: int = 1,
    integration_method: str = "backprop",
    pipeline=None,
) -> Tuple[Array, State, Dict[str, Array]]:
    """Forward pass. ``x`` NHWC. Returns ``(logits, new_state, aux)``.

    ``pipeline`` (a ``parallel.PipelineConfig``) routes each layer's
    same-shape ODE-block stack through GPipe over the config's mesh axis
    when the block count divides the stage count; other layers (and the
    ss-loss / adjoint paths) keep the sequential loop."""
    nd_bn1, pnd_bn1, act_bn1 = cfg.norm_def(2), cfg.pn_def(2), cfg.act(2)
    new_state: State = dict(state)

    preact = cfg.block_type == "prebasic" and not cfg.faithful_preact_bug

    out, new_state["conv1"] = _pn_conv(
        pnd_bn1, params["conv1"], state.get("conv1"), x, 1, 1, train
    )
    if not preact:
        out, new_state["bn1"] = nd_bn1.apply(params.get("bn1"),
                                             state.get("bn1"), out, train)
        out = act_bn1(out)

    ss_total = jnp.zeros((), x.dtype)
    n_layers = len(cfg.num_blocks)
    for li in range(n_layers):
        name = f"layer{li + 1}"
        lkey = None
        if key is not None:
            key, lkey = jax.random.split(key)
        out, new_state[name], ss = _meta_layer_apply(
            cfg, params[name], state[name], out, _layer_strides(cfg, li),
            solvers, solver_options, lkey, train,
            ss_loss, ss_loss_abs, remat, unroll, integration_method,
            pipeline,
        )
        ss_total = ss_total + ss

    if preact:
        out, new_state["bn1"] = nd_bn1.apply(params.get("bn1"),
                                             state.get("bn1"), out, train)
        out = act_bn1(out)

    out = fnn.global_avg_pool(out)
    logits = fnn.linear(params["fc"], out)
    return logits, new_state, {"ss_loss": ss_total}


# ------------------------------------------------------------- registry --


def _registry_cfg(block_type, num_blocks_ode, num_blocks_res, is_odenet,
                  **kw) -> CifarConfig:
    # an explicit num_blocks override replaces the registry counts —
    # custom deep ODE stacks (the runner's --num_blocks flag)
    nb = kw.pop("num_blocks", None)
    if nb is None:
        nb = num_blocks_ode if is_odenet else num_blocks_res
    nb = tuple(tuple(b) for b in nb)
    return CifarConfig(num_blocks=nb, block_type=block_type,
                       is_odenet=is_odenet, **kw)


def _make_ctor(block_type, ode_blocks, res_blocks):
    def ctor(is_odenet: bool = True, **kw) -> CifarConfig:
        return _registry_cfg(block_type, ode_blocks, res_blocks, is_odenet,
                             **kw)

    return ctor


# (res, ode) per stage — odenet_cifar10/layers.py:429-556
metanode4 = _make_ctor("basic", [(0, 1)], [(1, 0)])
metanode6 = _make_ctor("basic", [(1, 1)], [(2, 0)])
metanode10 = _make_ctor("basic", [(1, 1), (1, 1)], [(2, 0), (2, 0)])
metanode18 = _make_ctor(
    "basic", [(1, 1)] * 4, [(2, 0)] * 4
)
metanode34 = _make_ctor(
    "basic", [(1, 2), (1, 3), (1, 5), (1, 2)],
    [(3, 0), (4, 0), (6, 0), (3, 0)],
)
premetanode4 = _make_ctor("prebasic", [(0, 1)], [(1, 0)])
premetanode6 = _make_ctor("prebasic", [(1, 1)], [(2, 0)])
premetanode10 = _make_ctor("prebasic", [(1, 1), (1, 1)], [(2, 0), (2, 0)])
premetanode18 = _make_ctor(
    "prebasic", [(1, 1)] * 4, [(2, 0)] * 4
)
premetanode34 = _make_ctor(
    "prebasic", [(1, 2), (1, 3), (1, 5), (1, 2)],
    [(3, 0), (4, 0), (6, 0), (3, 0)],
)

MODEL_REGISTRY = {
    "metanode4": metanode4,
    "metanode6": metanode6,
    "metanode10": metanode10,
    "metanode18": metanode18,
    "metanode34": metanode34,
    "premetanode4": premetanode4,
    "premetanode6": premetanode6,
    "premetanode10": premetanode10,
    "premetanode18": premetanode18,
    "premetanode34": premetanode34,
}
