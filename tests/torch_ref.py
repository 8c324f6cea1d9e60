"""Shared torch replica of the reference MNIST MetaNODE + weight-copy
helpers, used by the forward-parity and train-step-parity tests.

Mirrors sopa/src/models/odenet_mnist/layers.py (norm/ConcatConv2d/ODEfunc/
MetaNODE, conv downsampling) and the reference RK2 ``_make_step`` stepping
(rk_parametric_order2stage2.py:87-93).
"""
import numpy as np
import torch
import torch.nn as tnn


def norm(dim):
    return tnn.GroupNorm(min(32, dim), dim)


class ConcatConv2d(tnn.Module):
    def __init__(self, dim_in, dim_out, ksize=3, stride=1, padding=0):
        super().__init__()
        self._layer = tnn.Conv2d(dim_in + 1, dim_out, ksize, stride, padding)

    def forward(self, t, x):
        tt = torch.ones_like(x[:, :1, :, :]) * t
        return self._layer(torch.cat([tt, x], 1))


class ODEfunc(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.norm1 = norm(dim)
        self.conv1 = ConcatConv2d(dim, dim, 3, 1, 1)
        self.norm2 = norm(dim)
        self.conv2 = ConcatConv2d(dim, dim, 3, 1, 1)
        self.norm3 = norm(dim)

    def forward(self, t, x):
        out = torch.relu(self.norm1(x))
        out = self.conv1(t, out)
        out = torch.relu(self.norm2(out))
        out = self.conv2(t, out)
        return self.norm3(out)


class TorchMetaNODE(tnn.Module):
    """Reference MNIST MetaNODE, conv downsampling (layers.py:96-209)."""

    def __init__(self, dim=64, in_ch=1):
        super().__init__()
        self.down = tnn.Sequential(
            tnn.Conv2d(in_ch, dim, 3, 1),
            norm(dim), tnn.ReLU(),
            tnn.Conv2d(dim, dim, 4, 2, 1),
            norm(dim), tnn.ReLU(),
            tnn.Conv2d(dim, dim, 4, 2, 1),
        )
        self.rhs = ODEfunc(dim)
        self.head_norm = norm(dim)
        self.fc = tnn.Linear(dim, 10)

    def integrate_rk2(self, x, u, n_steps):
        """Reference RK2 _make_step + fixed grid (rk2:87-93, rk_parametric:104)."""
        b2 = 1.0 / (2 * u)
        b1 = 1.0 - b2
        grid = np.linspace(0.0, 1.0, n_steps + 1)
        y = x
        for t0, t1 in zip(grid[:-1], grid[1:]):
            dt = t1 - t0
            k1 = self.rhs(torch.tensor(float(t0)), y)
            k2 = self.rhs(torch.tensor(float(t0 + u * dt)), y + k1 * (u * dt))
            y = y + (k1 * b1 + k2 * b2) * dt
        return y

    def forward(self, x, u=0.5, n_steps=8):
        x = self.down(x)
        x = self.integrate_rk2(x, u, n_steps)
        x = torch.relu(self.head_norm(x))
        x = x.mean(dim=(2, 3))
        return self.fc(x)


def copy_conv(tconv, jp):
    tconv.weight.data = torch.tensor(
        np.asarray(jp["kernel"]).transpose(3, 2, 0, 1)
    )
    if tconv.bias is not None:
        tconv.bias.data = torch.tensor(np.asarray(jp["bias"]))


def copy_gn(tgn, jp):
    tgn.weight.data = torch.tensor(np.asarray(jp["scale"]))
    tgn.bias.data = torch.tensor(np.asarray(jp["bias"]))


def copy_params_to_torch(tm: TorchMetaNODE, params) -> None:
    """Copy a JAX MNIST param tree (init_mnist layout) into the replica."""
    d = params["down"]
    copy_conv(tm.down[0], d["conv0"])
    copy_gn(tm.down[1], d["norm0"])
    copy_conv(tm.down[3], d["conv1"])
    copy_gn(tm.down[4], d["norm1"])
    copy_conv(tm.down[6], d["conv2"])
    blk = params["blocks"][0]
    copy_conv(tm.rhs.conv1._layer, blk["conv1"])
    copy_conv(tm.rhs.conv2._layer, blk["conv2"])
    copy_gn(tm.rhs.norm1, blk["norm1"])
    copy_gn(tm.rhs.norm2, blk["norm2"])
    copy_gn(tm.rhs.norm3, blk["norm3"])
    copy_gn(tm.head_norm, params["head"]["norm"])
    tm.fc.weight.data = torch.tensor(
        np.asarray(params["head"]["fc"]["kernel"]).T
    )
    tm.fc.bias.data = torch.tensor(np.asarray(params["head"]["fc"]["bias"]))
