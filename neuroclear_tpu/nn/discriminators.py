"""Discriminator zoo (reference: models/networks.py:1009-1179).

  * NLayerDiscriminator   :1009-1067 (PatchGAN — the production netD, 2D)
  * NLayerDiscriminatorSN :1069-1110 (spectral-norm PatchGAN)
  * KernelPatchDiscriminator :1113-1145 (KernelGAN-style k7 + 1x1 stack)
  * PixelDiscriminator    :1147-1179 (1x1 PixelGAN)

All are fully convolutional; the shipped models run them on 2D slices / MIPs
of 3D generator outputs.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax
import jax.numpy as jnp

from .core import Conv, Params, leaky_relu, relu, sigmoid
from .norms import NormSpec, get_norm_spec


@dataclasses.dataclass(frozen=True)
class NLayerDiscriminator:
    """PatchGAN: k4 conv stack, stride 2 x n_layers then stride 1, LeakyReLU(0.2)."""

    input_nc: int
    ndf: int = 64
    n_layers: int = 3
    norm: str = "instance"
    use_sigmoid: bool = False
    dim: int = 2
    spectral: bool = False

    def _convs(self) -> List[Tuple[str, Conv, bool]]:
        # (name, conv, has_norm)
        use_bias = (self.norm == "instance") and not self.spectral
        out = [("conv0", Conv(self.dim, self.input_nc, self.ndf, 4, 2, 1), False)]
        nf, nf_prev = 1, 1
        for n in range(1, self.n_layers):
            nf_prev, nf = nf, min(2 ** n, 8)
            out.append((f"conv{n}",
                        Conv(self.dim, self.ndf * nf_prev, self.ndf * nf, 4, 2, 1,
                             bias=use_bias), not self.spectral))
        nf_prev, nf = nf, min(2 ** self.n_layers, 8)
        out.append((f"conv{self.n_layers}",
                    Conv(self.dim, self.ndf * nf_prev, self.ndf * nf, 4, 1, 1,
                         bias=use_bias), not self.spectral))
        out.append(("conv_out", Conv(self.dim, self.ndf * nf, 1, 4, 1, 1), False))
        return out

    def init(self, key, init_type="normal", gain=0.02) -> Params:
        ns = get_norm_spec(self.norm, self.dim)
        p = {}
        keys = iter(jax.random.split(key, 2 * len(self._convs()) + 2))
        for name, conv, has_norm in self._convs():
            p[name] = conv.init(next(keys), init_type, gain)
            if self.spectral:
                # persistent power-iteration vector for spectral norm
                rows = conv.out_c
                cols = conv.in_c * conv.k ** self.dim
                p[name]["u"] = jax.random.normal(next(keys), (rows,))
            if has_norm and ns.has_params:
                p[name + "_norm"] = ns.init(next(keys), conv.out_c, gain)
        return p

    def apply(self, p: Params, x: jnp.ndarray) -> jnp.ndarray:
        ns = get_norm_spec(self.norm, self.dim)
        convs = self._convs()
        for i, (name, conv, has_norm) in enumerate(convs):
            cp = p[name]
            if self.spectral:
                cp = dict(cp)
                cp["w"] = _spectral_normalise(cp["w"], cp["u"])
            x = conv.apply(cp, x)
            if has_norm and not self.spectral:
                x = ns.apply(p.get(name + "_norm", {}), x)
            if i < len(convs) - 1:
                x = leaky_relu(x, 0.2)
        if self.use_sigmoid:
            x = sigmoid(x)
        return x


def _spectral_normalise(w: jnp.ndarray, u: jnp.ndarray, n_iter: int = 3) -> jnp.ndarray:
    """Spectral norm via power iteration from a persistent u.

    Functionally pure: unlike torch's in-place update of u we run ``n_iter``
    iterations from the stored vector each call (stable for these shallow
    nets; the *_SN discriminators are not part of any shipped config).
    """
    rows = w.shape[-1]
    wm = w.reshape(-1, rows).T  # (out, in*k*k)
    u = jax.lax.stop_gradient(u)
    for _ in range(n_iter):
        v = wm.T @ u
        v = v / (jnp.linalg.norm(v) + 1e-12)
        u = wm @ v
        u = u / (jnp.linalg.norm(u) + 1e-12)
    sigma = u @ (wm @ v)
    return w / jax.lax.stop_gradient(sigma)


@dataclasses.dataclass(frozen=True)
class KernelPatchDiscriminator:
    """KernelGAN PatchGAN: k7 head (no ReLU), (n_layers-2) x [1x1 conv + norm +
    ReLU], 1x1 output (networks.py:1113-1145)."""

    input_nc: int
    ndf: int = 64
    n_layers: int = 5
    norm: str = "instance"
    dim: int = 2

    def init(self, key, init_type="normal", gain=0.02) -> Params:
        ns = get_norm_spec(self.norm, self.dim)
        use_bias = self.norm == "instance"
        p = {}
        keys = iter(jax.random.split(key, 2 * self.n_layers + 2))
        p["first_layer"] = Conv(self.dim, self.input_nc, self.ndf, 7, 1, 0,
                                bias=use_bias).init(next(keys), init_type, gain)
        for i in range(self.n_layers - 2):
            p[f"feat{i}"] = Conv(self.dim, self.ndf, self.ndf, 1, 1, 0,
                                 bias=use_bias).init(next(keys), init_type, gain)
            if ns.has_params:
                p[f"feat{i}_norm"] = ns.init(next(keys), self.ndf, gain)
        p["final_layer"] = Conv(self.dim, self.ndf, 1, 1, 1, 0,
                                bias=use_bias).init(next(keys), init_type, gain)
        return p

    def apply(self, p: Params, x: jnp.ndarray) -> jnp.ndarray:
        ns = get_norm_spec(self.norm, self.dim)
        use_bias = self.norm == "instance"
        x = Conv(self.dim, self.input_nc, self.ndf, 7, 1, 0, bias=use_bias).apply(
            p["first_layer"], x)
        for i in range(self.n_layers - 2):
            x = Conv(self.dim, self.ndf, self.ndf, 1, 1, 0, bias=use_bias).apply(
                p[f"feat{i}"], x)
            x = relu(ns.apply(p.get(f"feat{i}_norm", {}), x))
        return Conv(self.dim, self.ndf, 1, 1, 1, 0, bias=use_bias).apply(
            p["final_layer"], x)


@dataclasses.dataclass(frozen=True)
class PixelDiscriminator:
    """1x1 PixelGAN (networks.py:1147-1179)."""

    input_nc: int
    ndf: int = 64
    norm: str = "instance"
    dim: int = 2

    def init(self, key, init_type="normal", gain=0.02) -> Params:
        ns = get_norm_spec(self.norm, self.dim)
        use_bias = self.norm == "instance"
        k0, k1, k2, k3 = jax.random.split(key, 4)
        p = {
            "conv0": Conv(self.dim, self.input_nc, self.ndf, 1, 1, 0).init(k0, init_type, gain),
            "conv1": Conv(self.dim, self.ndf, self.ndf * 2, 1, 1, 0, bias=use_bias).init(
                k1, init_type, gain),
            "conv2": Conv(self.dim, self.ndf * 2, 1, 1, 1, 0, bias=use_bias).init(
                k2, init_type, gain),
        }
        if ns.has_params:
            p["norm1"] = ns.init(k3, self.ndf * 2, gain)
        return p

    def apply(self, p: Params, x: jnp.ndarray) -> jnp.ndarray:
        ns = get_norm_spec(self.norm, self.dim)
        use_bias = self.norm == "instance"
        x = leaky_relu(Conv(self.dim, self.input_nc, self.ndf, 1, 1, 0).apply(p["conv0"], x), 0.2)
        x = Conv(self.dim, self.ndf, self.ndf * 2, 1, 1, 0, bias=use_bias).apply(p["conv1"], x)
        x = leaky_relu(ns.apply(p.get("norm1", {}), x), 0.2)
        return Conv(self.dim, self.ndf * 2, 1, 1, 1, 0, bias=use_bias).apply(p["conv2"], x)
