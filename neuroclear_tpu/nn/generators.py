"""Generator zoo — TPU-native re-implementations of the reference generators.

Behavioural parity targets (all in /root/reference/models/networks.py):
  * Unet_deconv        :478-538  (production netG — 2-level 3D U-Net, sigmoid head)
  * Unet_vanilla       :540-608  (3-level variant)
  * DeepLinearGenerator:893-917  (production netG_B — purely linear conv stack)
  * LinearKernel*      :840-889  (single/double/blur+noise learned linear kernels)
  * FixedLinearKernel  :921-939  (frozen PSF + gauss/poisson noise)
  * ResnetGenerator    :724-837  (2D template resnet, sigmoid head)
  * VGG_net            :675-720  (VGG classifier for axial/lateral experiments)
  * UnetTwoOuts        :943-1005 (legacy two-head 3D U-Net)

Layouts are channels-last (NDHWC/NHWC); see nn/core.py.  Networks are
(init, apply) pairs over nested param dicts.

NOTE: the reference contains two broken classes we intentionally *fix* rather
than replicate — `Unet_vanilla_shallow` (undefined layer + bad super,
networks.py:617,651) and `LinearKernel_NC`'s bad super (networks.py:876).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .core import Conv, ConvTranspose, Params, max_pool, relu, sigmoid
from .norms import NormSpec, get_norm_spec


# ---------------------------------------------------------------------------
# Conv blocks (reference: double_conv/last_conv/triple_conv, networks.py:413-476)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ConvBlock:
    """n x (conv k3 s1 p1 -> norm -> ReLU)."""

    dim: int
    in_c: int
    out_c: int
    n: int
    norm: NormSpec
    k: int = 3
    stride: int = 1
    pad: int = 1
    # checkpoint each conv->norm->relu unit (see UNetDeconv.remat)
    remat: bool = False

    def init(self, key, init_type, gain) -> Params:
        p = {}
        keys = jax.random.split(key, 2 * self.n)
        for i in range(self.n):
            in_c = self.in_c if i == 0 else self.out_c
            conv = Conv(self.dim, in_c, self.out_c, self.k, self.stride, self.pad)
            p[f"conv{i}"] = conv.init(keys[2 * i], init_type, gain)
            if self.norm.has_params:
                p[f"norm{i}"] = self.norm.init(keys[2 * i + 1], self.out_c, gain)
        return p

    def _packed_plan(self, in_shape) -> list:
        """Trace-time decision per unit: may it run packed-resident?
        Mirrors apply()'s loop on shapes only, so consumers (UNetDeconv's
        pool/skip plumbing) can ask for the exit layout without tracing."""
        from ..ops import packed_block as pb

        flags, shape = [], tuple(in_shape)
        for i in range(self.n):
            in_c = self.in_c if i == 0 else self.out_c
            flags.append(pb.unit_supported(shape, in_c, self.out_c, self.k,
                                           self.stride, self.pad, self.dim,
                                           self.norm.kind))
            spatial = tuple((s + 2 * self.pad - self.k) // self.stride + 1
                            for s in shape[1:-1])
            shape = (shape[0],) + spatial + (self.out_c,)
        return flags

    def exit_packed(self, in_shape) -> bool:
        """Does apply(..., packed_out=True) return the packed layout?"""
        return self._packed_plan(in_shape)[-1]

    def apply(self, p: Params, x: jnp.ndarray,
              packed_out: bool = False) -> jnp.ndarray:
        from ..ops import packed_block as pb

        ck = jax.checkpoint if self.remat else (lambda f: f)
        flags = self._packed_plan(x.shape)
        packed = False  # trace-time: is x currently in the packed layout?
        for i in range(self.n):
            conv = Conv(self.dim, self.in_c if i == 0 else self.out_c,
                        self.out_c, self.k, self.stride, self.pad)

            if flags[i]:
                # packed-resident unit (ops/packed_block.py): conv, norm and
                # ReLU all run on the lane-dense W-pair layout
                if not packed:
                    x = pb.pack(x)
                    packed = True

                def unit_p(q, v, i=i):
                    v = pb.conv_packed(v, q[f"conv{i}"]["w"],
                                       q[f"conv{i}"].get("b"))
                    return pb.norm_act_packed(v, self.norm.kind, "relu")

                x = ck(unit_p)(p, x)
                continue
            if packed:
                x = pb.unpack(x)
                packed = False

            def unit(q, v, conv=conv, i=i):
                v = conv.apply(q[f"conv{i}"], v)
                v = self.norm.apply(q.get(f"norm{i}", {}), v)
                return relu(v)

            x = ck(unit)(p, x)
        return pb.unpack(x) if packed and not packed_out else x


# ---------------------------------------------------------------------------
# Unet_deconv — the production generator (networks.py:478-538)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class UNetDeconv:
    """2-level 3D U-Net with transposed-conv upsampling and a sigmoid head.

    Channel plan for input_nc=1: 64 -> 128 -> (bottom 256) -> 128 -> 64 ->
    1x1x1 -> 1x1x1 -> sigmoid.  (start_nc = input_nc*64, networks.py:487.)
    """

    input_nc: int
    output_nc: int
    norm: str = "instance"
    dim: int = 3
    # per-block rematerialisation: checkpoint each ConvBlock so the backward
    # pass holds one block's interior at a time (whole-apply jax.checkpoint
    # does NOT cut the fwd+bwd peak — a fresh 148^3 apollo step compile needed
    # 19.7 GB HBM without this).  Set via models' --remat (gan_common.maybe_remat).
    remat: bool = False

    def _parts(self):
        ns = get_norm_spec(self.norm, self.dim)
        s = self.input_nc * 64
        r = self.remat
        return ns, s, {
            "double_conv1": ConvBlock(self.dim, self.input_nc, s, 2, ns, remat=r),
            "double_conv2": ConvBlock(self.dim, s, s * 2, 2, ns, remat=r),
            "bottom_layer": ConvBlock(self.dim, s * 2, s * 4, 3, ns, remat=r),
            "t_conv2": ConvTranspose(self.dim, s * 4, s * 2, 2, 2),
            "ex_double_conv2": ConvBlock(self.dim, s * 4, s * 2, 2, ns, remat=r),
            "t_conv1": ConvTranspose(self.dim, s * 2, s, 2, 2),
            "ex_conv1_1": ConvBlock(self.dim, s * 2, s, 1, ns, remat=r),
            "one_by_one": Conv(self.dim, s, self.output_nc, 1, 1, 0),
            "one_by_one_2": Conv(self.dim, self.output_nc, self.output_nc, 1, 1, 0),
        }

    def init(self, key, init_type="normal", gain=0.02) -> Params:
        _, _, parts = self._parts()
        keys = jax.random.split(key, len(parts))
        return {n: m.init(k, init_type, gain) for (n, m), k in zip(parts.items(), keys)}

    def apply(self, p: Params, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops import packed_block as pb

        _, _, m = self._parts()
        ck = jax.checkpoint if self.remat else (lambda f: f)
        # skip-concats happen INSIDE the checkpointed blocks so the saved
        # residuals are the two halves, not an extra concatenated copy
        #
        # when double_conv1 ends on a packed-resident unit, keep its exit
        # PACKED: the pool consumes the lane pair directly and the skip
        # residual is saved lane-dense (half the bytes of the padded C=64
        # form) — the one unpack happens inside the ex_conv1_1 checkpoint
        c1_pk = self.dim == 3 and m["double_conv1"].exit_packed(x.shape)
        if c1_pk:
            conv1 = ck(lambda q, v: m["double_conv1"].apply(
                q, v, packed_out=True))(p["double_conv1"], x)
            down1 = pb.max_pool_packed(conv1)
        else:
            conv1 = ck(m["double_conv1"].apply)(p["double_conv1"], x)
            down1 = max_pool(conv1, 2, self.dim)
        conv2 = ck(m["double_conv2"].apply)(p["double_conv2"], down1)
        down2 = max_pool(conv2, 2, self.dim)
        bottom = ck(m["bottom_layer"].apply)(p["bottom_layer"], down2)
        up2 = m["t_conv2"].apply(p["t_conv2"], bottom)

        def _ex2(q, a, b):
            return m["ex_double_conv2"].apply(q, jnp.concatenate([a, b], axis=-1))

        ex2 = ck(_ex2)(p["ex_double_conv2"], conv2, up2)
        up1 = m["t_conv1"].apply(p["t_conv1"], ex2)

        def _ex1(q, a, b):
            if c1_pk:
                a = pb.unpack(a)
            return m["ex_conv1_1"].apply(q, jnp.concatenate([a, b], axis=-1))

        ex1 = ck(_ex1)(p["ex_conv1_1"], conv1, up1)
        y = m["one_by_one"].apply(p["one_by_one"], ex1)
        y = m["one_by_one_2"].apply(p["one_by_one_2"], y)
        return sigmoid(y)


# ---------------------------------------------------------------------------
# Unet_vanilla — 3-level variant (networks.py:540-608)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class UNetVanilla:
    input_nc: int
    output_nc: int
    norm: str = "instance"
    dim: int = 3

    def _parts(self):
        ns = get_norm_spec(self.norm, self.dim)
        s = self.input_nc * 64
        return {
            "double_conv1": ConvBlock(self.dim, self.input_nc, s, 2, ns),
            "double_conv2": ConvBlock(self.dim, s, s * 2, 2, ns),
            "double_conv3": ConvBlock(self.dim, s * 2, s * 4, 2, ns),
            "bottom_layer": ConvBlock(self.dim, s * 4, s * 8, 2, ns),
            "t_conv3": ConvTranspose(self.dim, s * 8, s * 4, 2, 2),
            "ex_double_conv3": ConvBlock(self.dim, s * 8, s * 4, 2, ns),
            "t_conv2": ConvTranspose(self.dim, s * 4, s * 2, 2, 2),
            "ex_double_conv2": ConvBlock(self.dim, s * 4, s * 2, 2, ns),
            "t_conv1": ConvTranspose(self.dim, s * 2, s, 2, 2),
            "ex_conv1_1": ConvBlock(self.dim, s * 2, s, 2, ns),
            "one_by_one": Conv(self.dim, s, self.output_nc, 1, 1, 0),
        }

    def init(self, key, init_type="normal", gain=0.02) -> Params:
        parts = self._parts()
        keys = jax.random.split(key, len(parts))
        return {n: m.init(k, init_type, gain) for (n, m), k in zip(parts.items(), keys)}

    def apply(self, p: Params, x: jnp.ndarray) -> jnp.ndarray:
        m = self._parts()
        conv1 = m["double_conv1"].apply(p["double_conv1"], x)
        conv2 = m["double_conv2"].apply(p["double_conv2"], max_pool(conv1, 2, self.dim))
        conv3 = m["double_conv3"].apply(p["double_conv3"], max_pool(conv2, 2, self.dim))
        bottom = m["bottom_layer"].apply(p["bottom_layer"], max_pool(conv3, 2, self.dim))
        x3 = m["ex_double_conv3"].apply(
            p["ex_double_conv3"],
            jnp.concatenate([conv3, m["t_conv3"].apply(p["t_conv3"], bottom)], -1),
        )
        x2 = m["ex_double_conv2"].apply(
            p["ex_double_conv2"],
            jnp.concatenate([conv2, m["t_conv2"].apply(p["t_conv2"], x3)], -1),
        )
        x1 = m["ex_conv1_1"].apply(
            p["ex_conv1_1"],
            jnp.concatenate([conv1, m["t_conv1"].apply(p["t_conv1"], x2)], -1),
        )
        return sigmoid(m["one_by_one"].apply(p["one_by_one"], x1))


# ---------------------------------------------------------------------------
# DeepLinearGenerator — the production netG_B (networks.py:893-917)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DeepLinearGenerator:
    """KernelGAN-style purely linear 3D conv stack (no activations, no bias).

    k7(p3) -> k5(p2) -> k3(p1) at 64ch, then 1x1x1 64->32->16, final 1x1x1 to
    output.  Net effect: a learned 13^3 linear blur kernel modelling the
    forward PSF for the cycle path.
    """

    input_nc: int
    output_nc: int
    dim: int = 3

    def _convs(self) -> Sequence[Tuple[str, Conv]]:
        c = self.input_nc * 64
        return [
            ("first_layer", Conv(self.dim, self.input_nc, c, 7, 1, 3, bias=False)),
            ("feat0", Conv(self.dim, c, c, 5, 1, 2, bias=False)),
            ("feat1", Conv(self.dim, c, c, 3, 1, 1, bias=False)),
            ("feat2", Conv(self.dim, c, c // 2, 1, 1, 0, bias=False)),
            ("feat3", Conv(self.dim, c // 2, c // 4, 1, 1, 0, bias=False)),
            ("final_layer", Conv(self.dim, c // 4, self.output_nc, 1, 1, 0, bias=False)),
        ]

    def init(self, key, init_type="normal", gain=0.02) -> Params:
        convs = self._convs()
        keys = jax.random.split(key, len(convs))
        return {n: c.init(k, init_type, gain) for (n, c), k in zip(convs, keys)}

    def apply(self, p: Params, x: jnp.ndarray) -> jnp.ndarray:
        for n, c in self._convs():
            x = c.apply(p[n], x)
        return x


# ---------------------------------------------------------------------------
# LinearKernel family (networks.py:840-889, 921-939)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class LinearKernel:
    """Single learned same-size linear conv (bias-free)."""

    input_nc: int
    output_nc: int
    kernel_size: int
    dim: int = 3
    double: bool = False  # LinearKernel_double applies the same conv twice

    def _conv(self) -> Conv:
        pad = int(round((self.kernel_size - 1) / 2))
        return Conv(self.dim, self.input_nc, self.output_nc, self.kernel_size, 1, pad, bias=False)

    def init(self, key, init_type="normal", gain=0.02) -> Params:
        return {"convlayer": self._conv().init(key, init_type, gain)}

    def apply(self, p: Params, x: jnp.ndarray) -> jnp.ndarray:
        c = self._conv()
        y = c.apply(p["convlayer"], x)
        if self.double:
            y = c.apply(p["convlayer"], y)
        return y


@dataclasses.dataclass(frozen=True)
class LinearKernelNC:
    """Blur conv + noise conv, summed (reference's LinearKernel_NC, with the
    broken ``super`` call fixed)."""

    input_nc: int
    output_nc: int
    kernel_size: int
    dim: int = 3

    def _conv(self) -> Conv:
        pad = int(round((self.kernel_size - 1) / 2))
        return Conv(self.dim, self.input_nc, self.output_nc, self.kernel_size, 1, pad, bias=False)

    def init(self, key, init_type="normal", gain=0.02) -> Params:
        k1, k2 = jax.random.split(key)
        c = self._conv()
        return {"blur_convlayer": c.init(k1, init_type, gain),
                "noise_convlayer": c.init(k2, init_type, gain)}

    def apply(self, p: Params, x: jnp.ndarray) -> jnp.ndarray:
        c = self._conv()
        return c.apply(p["blur_convlayer"], x) + c.apply(p["noise_convlayer"], x)


@dataclasses.dataclass(frozen=True)
class FixedLinearKernel:
    """Frozen PSF conv + Gaussian & Poisson noise (networks.py:921-939).

    The PSF is stored in params but should be excluded from optimisation (the
    reference sets requires_grad=False).  Noise is injected with a jax PRNG
    key passed to apply (the reference used host-side np.random:
    util/util.py:74-99).
    """

    kernel_shape: Tuple[int, ...]
    gau_sigma: float
    poisson_peak: float
    dim: int = 3

    def init_from_psf(self, psf: np.ndarray) -> Params:
        # Accept torch-layout (out,in,*k) or raw (*k,) PSF; store DHWIO.
        psf = np.asarray(psf, np.float32)
        if psf.ndim == self.dim:
            psf = psf[..., None, None]
        elif psf.ndim == self.dim + 2:  # (O, I, *k) -> (*k, I, O)
            psf = np.moveaxis(psf, (0, 1), (-1, -2))
        return {"psf": jnp.asarray(psf)}

    def apply(self, p: Params, x: jnp.ndarray, rng: Optional[jax.Array] = None) -> jnp.ndarray:
        k = p["psf"].shape[: self.dim]
        pads = tuple((int(round((kk - 1) / 2)),) * 2 for kk in k)
        from .core import _conv_precision

        y = jax.lax.conv_general_dilated(
            x, p["psf"].astype(x.dtype), (1,) * self.dim, pads,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC") if self.dim == 3 else ("NHWC", "HWIO", "NHWC"),
            precision=_conv_precision(x.dtype),
        )
        if k[-1] % 2 == 0:  # even kernels over-pad by one; centre-crop
            y = y[(slice(None),) + (slice(1, None),) * self.dim + (slice(None),)]
        if rng is not None:
            kg, kp = jax.random.split(rng)
            y = y + jax.random.normal(kg, y.shape) * self.gau_sigma
            y = _minmax01(y)
            y = jax.random.poisson(kp, y * self.poisson_peak).astype(y.dtype) / self.poisson_peak
            y = _minmax01(y)
        return y


def _minmax01(x: jnp.ndarray) -> jnp.ndarray:
    lo, hi = jnp.min(x), jnp.max(x)
    return (x - lo) / jnp.maximum(hi - lo, 1e-12)


# ---------------------------------------------------------------------------
# ResnetGenerator — 2D template (networks.py:724-837); kept for --netG parity
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ResnetGenerator:
    input_nc: int
    output_nc: int
    ngf: int = 64
    norm: str = "instance"
    n_blocks: int = 6
    dim: int = 2

    def init(self, key, init_type="normal", gain=0.02) -> Params:
        ns = get_norm_spec(self.norm, self.dim)
        use_bias = self.norm == "instance"
        p = {}
        keys = iter(jax.random.split(key, 64))
        p["head"] = Conv(self.dim, self.input_nc, self.ngf, 7, 1, 0, bias=use_bias).init(
            next(keys), init_type, gain)
        if ns.has_params:
            p["head_norm"] = ns.init(next(keys), self.ngf, gain)
        for i in range(2):
            mult = 2 ** i
            p[f"down{i}"] = Conv(self.dim, self.ngf * mult, self.ngf * mult * 2, 3, 2, 1,
                                 bias=use_bias).init(next(keys), init_type, gain)
            if ns.has_params:
                p[f"down{i}_norm"] = ns.init(next(keys), self.ngf * mult * 2, gain)
        mult = 4
        for i in range(self.n_blocks):
            c = self.ngf * mult
            p[f"block{i}_conv0"] = Conv(self.dim, c, c, 3, 1, 0, bias=use_bias).init(
                next(keys), init_type, gain)
            p[f"block{i}_conv1"] = Conv(self.dim, c, c, 3, 1, 0, bias=use_bias).init(
                next(keys), init_type, gain)
            if ns.has_params:
                p[f"block{i}_norm0"] = ns.init(next(keys), c, gain)
                p[f"block{i}_norm1"] = ns.init(next(keys), c, gain)
        for i in range(2):
            mult = 2 ** (2 - i)
            p[f"up{i}"] = ConvTranspose(self.dim, self.ngf * mult, self.ngf * mult // 2,
                                        3, 2, bias=use_bias).init(next(keys), init_type, gain)
            if ns.has_params:
                p[f"up{i}_norm"] = ns.init(next(keys), self.ngf * mult // 2, gain)
        p["tail"] = Conv(self.dim, self.ngf, self.output_nc, 7, 1, 0).init(
            next(keys), init_type, gain)
        return p

    def apply(self, p: Params, x: jnp.ndarray) -> jnp.ndarray:
        ns = get_norm_spec(self.norm, self.dim)
        use_bias = self.norm == "instance"

        def refl(x, n):
            pad = [(0, 0)] + [(n, n)] * self.dim + [(0, 0)]
            return jnp.pad(x, pad, mode="reflect")

        x = refl(x, 3)
        x = Conv(self.dim, self.input_nc, self.ngf, 7, 1, 0, bias=use_bias).apply(p["head"], x)
        x = ns.apply(p.get("head_norm", {}), x)
        x = relu(x)
        for i in range(2):
            mult = 2 ** i
            x = Conv(self.dim, self.ngf * mult, self.ngf * mult * 2, 3, 2, 1,
                     bias=use_bias).apply(p[f"down{i}"], x)
            x = ns.apply(p.get(f"down{i}_norm", {}), x)
            x = relu(x)
        mult = 4
        c = self.ngf * mult
        for i in range(self.n_blocks):
            h = refl(x, 1)
            h = Conv(self.dim, c, c, 3, 1, 0, bias=use_bias).apply(p[f"block{i}_conv0"], h)
            h = ns.apply(p.get(f"block{i}_norm0", {}), h)
            h = relu(h)
            h = refl(h, 1)
            h = Conv(self.dim, c, c, 3, 1, 0, bias=use_bias).apply(p[f"block{i}_conv1"], h)
            h = ns.apply(p.get(f"block{i}_norm1", {}), h)
            x = x + h
        for i in range(2):
            mult = 2 ** (2 - i)
            # torch ConvTranspose2d(k=3,s=2,p=1,output_padding=1): exact 2x.
            y = ConvTranspose(self.dim, self.ngf * mult, self.ngf * mult // 2, 3, 2,
                              bias=use_bias).apply(p[f"up{i}"], x)
            # VALID transpose gives 2N+1; crop torch's (p=1, out_pad=1) window:
            y = y[(slice(None),) + (slice(1, None),) * self.dim + (slice(None),)]
            x = relu(ns.apply(p.get(f"up{i}_norm", {}), y))
        x = refl(x, 3)
        x = Conv(self.dim, self.ngf, self.output_nc, 7, 1, 0).apply(p["tail"], x)
        return sigmoid(x)


# ---------------------------------------------------------------------------
# VGG_net — 2D classifier (networks.py:675-720)
# ---------------------------------------------------------------------------

VGG_TYPES = {
    "VGG11": [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "VGG13": [64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "VGG16": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
              512, 512, 512, "M"],
    "VGG19": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512, 512, 512, 512,
              "M", 512, 512, 512, 512, "M"],
}


@dataclasses.dataclass(frozen=True)
class VGGNet:
    input_nc: int
    num_classes: int = 2
    vgg_type: str = "VGG16"

    def init(self, key, init_type="normal", gain=0.02) -> Params:
        p = {}
        keys = iter(jax.random.split(key, 64))
        in_c = self.input_nc
        ci = 0
        ns = get_norm_spec("batch", 2)
        for spec in VGG_TYPES[self.vgg_type]:
            if spec == "M":
                continue
            p[f"conv{ci}"] = Conv(2, in_c, spec, 3, 1, 1).init(next(keys), init_type, gain)
            p[f"bn{ci}"] = ns.init(next(keys), spec, gain)
            in_c = spec
            ci += 1
        p["fc0"] = _linear_init(next(keys), 512 * 7 * 7, 4096, init_type, gain)
        p["fc1"] = _linear_init(next(keys), 4096, 4096, init_type, gain)
        p["fc2"] = _linear_init(next(keys), 4096, self.num_classes, init_type, gain)
        return p

    def apply(self, p: Params, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        ns = get_norm_spec("batch", 2)
        ci = 0
        for spec in VGG_TYPES[self.vgg_type]:
            if spec == "M":
                x = max_pool(x, 2, 2)
                continue
            x = Conv(2, x.shape[-1], spec, 3, 1, 1).apply(p[f"conv{ci}"], x)
            x = relu(ns.apply(p[f"bn{ci}"], x))
            ci += 1
        # AdaptiveAvgPool2d((7,7))
        x = jax.image.resize(x, (x.shape[0], 7, 7, x.shape[-1]), method="linear")
        x = x.reshape(x.shape[0], -1)
        x = relu(x @ p["fc0"]["w"] + p["fc0"]["b"])
        x = relu(x @ p["fc1"]["w"] + p["fc1"]["b"])
        return x @ p["fc2"]["w"] + p["fc2"]["b"]


def _linear_init(key, in_f, out_f, init_type, gain):
    from .core import init_weight

    return {"w": init_weight(key, (in_f, out_f), init_type, gain), "b": jnp.zeros((out_f,))}


# ---------------------------------------------------------------------------
# UnetTwoOuts — legacy two-head 3D U-Net (networks.py:943-1005)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class UNetTwoOuts:
    input_nc: int  # channel multiplier in the reference (first conv is 1->input_nc)
    output_nc: int
    dim: int = 3

    def _parts(self):
        ns = get_norm_spec("batch", self.dim)  # reference passes norm_layer=None ->
        # double_conv called with default norm_layer=None would crash; the class
        # is dead code in the reference.  We use batch norm to keep it usable.
        c = self.input_nc
        return {
            "double_conv1": ConvBlock(self.dim, 1, c, 2, ns),
            "double_conv2": ConvBlock(self.dim, c, c * 2, 2, ns),
            "double_conv3": ConvBlock(self.dim, c * 2, c * 4, 2, ns),
            "double_conv5": ConvBlock(self.dim, c * 4, c * 8, 2, ns),
            "t_conv3": ConvTranspose(self.dim, c * 8, c * 4, 2, 2),
            "ex_double_conv3": ConvBlock(self.dim, c * 8, c * 4, 2, ns),
            "t_conv2": ConvTranspose(self.dim, c * 4, c * 2, 2, 2),
            "ex_double_conv2": ConvBlock(self.dim, c * 4, c * 2, 2, ns),
            "t_conv1": ConvTranspose(self.dim, c * 2, c, 2, 2),
            "ex_double_conv1": ConvBlock(self.dim, c * 2, c, 2, ns),
            "one_by_one": Conv(self.dim, c, self.output_nc, 1, 1, 0),
            "one_by_one_2": ConvBlock(self.dim, c, 1, 2, ns, k=1, pad=0),
        }

    def init(self, key, init_type="normal", gain=0.02) -> Params:
        parts = self._parts()
        keys = jax.random.split(key, len(parts))
        return {n: m.init(k, init_type, gain) for (n, m), k in zip(parts.items(), keys)}

    def apply(self, p: Params, x: jnp.ndarray):
        m = self._parts()
        conv1 = m["double_conv1"].apply(p["double_conv1"], x)
        conv2 = m["double_conv2"].apply(p["double_conv2"], max_pool(conv1, 2, self.dim))
        conv3 = m["double_conv3"].apply(p["double_conv3"], max_pool(conv2, 2, self.dim))
        conv5 = m["double_conv5"].apply(p["double_conv5"], max_pool(conv3, 2, self.dim))
        x3 = m["ex_double_conv3"].apply(
            p["ex_double_conv3"],
            jnp.concatenate([conv3, m["t_conv3"].apply(p["t_conv3"], conv5)], -1))
        x2 = m["ex_double_conv2"].apply(
            p["ex_double_conv2"],
            jnp.concatenate([conv2, m["t_conv2"].apply(p["t_conv2"], x3)], -1))
        x1 = m["ex_double_conv1"].apply(
            p["ex_double_conv1"],
            jnp.concatenate([conv1, m["t_conv1"].apply(p["t_conv1"], x2)], -1))
        return (m["one_by_one"].apply(p["one_by_one"], x1),
                m["one_by_one_2"].apply(p["one_by_one_2"], x1))
