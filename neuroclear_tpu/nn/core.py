"""Functional layer primitives for neuroclear_tpu.

Layers are small frozen dataclasses: ``layer.init(key, init_type, gain)``
returns a param dict, ``layer.apply(params, x)`` is a pure function.  Network
parameters are plain nested dicts (pytrees) — transparent to ``jax.grad``,
``optax`` and ``pjit``.

Layout conventions (TPU-native, channels-last):
  * 3D tensors: ``(N, Z, Y, X, C)``  — conv kernels ``(kz, ky, kx, Cin, Cout)``.
  * 2D tensors: ``(N, H, W, C)``     — conv kernels ``(kh, kw, Cin, Cout)``.

This mirrors the behaviour (not the torch layout) of the reference network
helpers in ``/root/reference/models/networks.py:361-411`` (dimension-dispatch
conv/maxpool/convtranspose) and ``:20-44`` (instance norm, affine=False).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, jnp.ndarray]


# ---------------------------------------------------------------------------
# Weight initialisation (reference: models/networks.py:88-119 init_weights)
# ---------------------------------------------------------------------------


def _fans(kshape: Tuple[int, ...], transpose: bool) -> Tuple[int, int]:
    """fan_in / fan_out matching torch's _calculate_fan_in_and_fan_out.

    For a normal conv weight (out,in,*k) torch uses fan_in = in*prod(k).
    For a transposed conv weight (in,out,*k) torch's rule keys off dim 1,
    giving fan_in = out*prod(k).  Our kernels are (*k, I, O).
    """
    receptive = int(np.prod(kshape[:-2]))
    i, o = kshape[-2], kshape[-1]
    if transpose:
        return o * receptive, i * receptive
    return i * receptive, o * receptive


def init_weight(key, kshape, init_type: str, gain: float, transpose: bool = False):
    """Sample a conv/linear weight per the reference init schemes.

    normal: N(0, gain); xavier: N(0, gain*sqrt(2/(fi+fo)));
    kaiming: N(0, sqrt(2/fan_in)); orthogonal: orthogonal*gain.
    """
    fan_in, fan_out = _fans(kshape, transpose)
    if init_type == "normal":
        return jax.random.normal(key, kshape) * gain
    if init_type == "xavier":
        std = gain * math.sqrt(2.0 / (fan_in + fan_out))
        return jax.random.normal(key, kshape) * std
    if init_type == "kaiming":
        std = math.sqrt(2.0 / fan_in)
        return jax.random.normal(key, kshape) * std
    if init_type == "orthogonal":
        # Flatten to (rows=out, cols=rest) like torch.nn.init.orthogonal_.
        rows = kshape[-1]
        cols = int(np.prod(kshape)) // rows
        a = jax.random.normal(key, (max(rows, cols), min(rows, cols)))
        q, r = jnp.linalg.qr(a)
        q = q * jnp.sign(jnp.diagonal(r))
        if rows < cols:
            q = q.T
        w = q[:rows, :cols] * gain
        # back to (*k, I, O): torch layout is (O, rest); transpose to (rest, O)
        return w.reshape((rows,) + kshape[:-1]).transpose(
            tuple(range(1, len(kshape))) + (0,)
        )
    raise NotImplementedError(f"initialization method [{init_type}] is not implemented")


# ---------------------------------------------------------------------------
# Convolutions
# ---------------------------------------------------------------------------


def _dim_numbers(dim: int):
    if dim == 2:
        return ("NHWC", "HWIO", "NHWC")
    if dim == 3:
        return ("NDHWC", "DHWIO", "NDHWC")
    raise ValueError("Invalid image dimension.")


def _conv_precision(dtype):
    """float32 inputs get true-f32 convolutions (torch parity); bfloat16
    inputs use the fast single-pass MXU path.  Without this, XLA's DEFAULT
    precision silently computes 'f32' convs at bf16 accuracy (~1e-2 rel
    error vs torch)."""
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


@dataclasses.dataclass(frozen=True)
class Conv:
    """N-d convolution with torch-style symmetric integer padding.

    Matches nn.Conv2d/Conv3d(in, out, k, stride, padding) semantics
    (reference dimension dispatch: models/networks.py:361-369).
    """

    dim: int
    in_c: int
    out_c: int
    k: int
    stride: int = 1
    pad: int = 0
    bias: bool = True

    def init(self, key, init_type: str = "normal", gain: float = 0.02) -> Params:
        kshape = (self.k,) * self.dim + (self.in_c, self.out_c)
        p = {"w": init_weight(key, kshape, init_type, gain)}
        if self.bias:
            p["b"] = jnp.zeros((self.out_c,))
        return p

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        # bf16 cout=64 3x3x3 stride-1 convs (the U-Net's hot layers) use the
        # output-z-pair packed formulation (ops/conv_zpack.py): XLA runs the
        # packed conv at its 128-wide machine rate, a measured win over its
        # half-width cout=64 emitter.  NEUROCLEAR_ZPACK=0 opts out.
        if (self.dim == 3 and self.k == 3 and self.stride == 1
                and self.pad == 1 and x.dtype == jnp.bfloat16):
            # W-pair lane packing (ops/conv_wpack.py): folds the minor
            # spatial dim into the channel lanes on BOTH sides via free
            # reshapes, fixing the measured limiter (cin-side lane padding,
            # docs/PERFORMANCE.md round-3 study).  NEUROCLEAR_WPACK=1
            # selects the XLA packed formulation; NEUROCLEAR_PALLAS_WCONV=1
            # the Pallas kernel of the same math.
            from ..ops import conv_wpack as wp
            from ..ops import pallas_wconv as pwc

            if pwc.supported(x.shape, self.in_c, self.out_c, self.k,
                             self.stride, self.pad, self.dim):
                y = pwc.conv3d_wpack_pallas(x, params["w"].astype(x.dtype))
                if self.bias:
                    y = y + params["b"].astype(y.dtype)
                return y
            if (wp.ENABLED and wp.supported(x.shape, self.in_c, self.out_c,
                                            self.k, self.stride, self.pad,
                                            self.dim)):
                y = wp.conv3d_wpack2(x, params["w"].astype(x.dtype))
                if self.bias:
                    y = y + params["b"].astype(y.dtype)
                return y
            from ..ops import conv_zpack as zp

            if (zp.ENABLED and zp.supported(x.shape, self.in_c, self.out_c,
                                            self.k, self.stride, self.pad,
                                            self.dim)):
                y = zp.conv3d_zpack2(x, params["w"].astype(x.dtype))
                if self.bias:
                    y = y + params["b"].astype(y.dtype)
                return y
            # the Pallas dense-K kernel attempt is kept for study behind
            # NEUROCLEAR_PALLAS_CONV=1 (rejected by Mosaic on current
            # hardware; docs/PERFORMANCE.md round-2 kernel study)
            from ..ops import pallas_conv as pc

            wshape = (3, 3, 3, self.in_c, self.out_c)
            if pc.supported(x.shape, wshape, (1, 1, 1), "SAME", (1, 1, 1)):
                y = pc.conv3d_3x3(x, params["w"].astype(x.dtype))
                if self.bias:
                    y = y + params["b"].astype(y.dtype)
                return y
        y = jax.lax.conv_general_dilated(
            x,
            params["w"].astype(x.dtype),
            window_strides=(self.stride,) * self.dim,
            padding=((self.pad, self.pad),) * self.dim,
            dimension_numbers=_dim_numbers(self.dim),
            precision=_conv_precision(x.dtype),
        )
        if self.bias:
            y = y + params["b"].astype(y.dtype)
        return y


@dataclasses.dataclass(frozen=True)
class ConvTranspose:
    """Transposed convolution, nn.ConvTranspose{2,3}d(in, out, k, stride) semantics.

    Used for the U-Net up path (reference models/networks.py:500-503) where
    k == stride == 2 (exact 2x upsampling, no overlap).
    """

    dim: int
    in_c: int
    out_c: int
    k: int
    stride: int
    bias: bool = True

    def init(self, key, init_type: str = "normal", gain: float = 0.02) -> Params:
        kshape = (self.k,) * self.dim + (self.in_c, self.out_c)
        p = {"w": init_weight(key, kshape, init_type, gain, transpose=True)}
        if self.bias:
            p["b"] = jnp.zeros((self.out_c,))
        return p

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        # lax.conv_transpose(transpose_kernel=False) correlates with the
        # kernel (spatially flipped vs torch's ConvTranspose); flip here so
        # semantics match nn.ConvTranspose{2,3}d exactly.
        w = params["w"][(slice(None, None, -1),) * self.dim]
        y = jax.lax.conv_transpose(
            x,
            w.astype(x.dtype),
            strides=(self.stride,) * self.dim,
            padding="VALID",
            dimension_numbers=_dim_numbers(self.dim),
            precision=_conv_precision(x.dtype),
        )
        if self.bias:
            y = y + params["b"].astype(y.dtype)
        return y


def max_pool(x: jnp.ndarray, window: int, dim: int) -> jnp.ndarray:
    """nn.MaxPool{2,3}d(window) with stride == window (floor semantics)."""
    dims = (1,) + (window,) * dim + (1,)
    return jax.lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max, dims, dims, "VALID",
    )


# ---------------------------------------------------------------------------
# Normalisation / activations
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class InstanceNorm:
    """InstanceNorm with affine=False, track_running_stats=False (parameter-free).

    Matches the reference's production norm layer exactly
    (models/networks.py:33-34): per-sample, per-channel standardisation over
    spatial dims with eps=1e-5 and biased variance.  Dispatches to
    ops/pallas_ops.instance_norm: by default a one-pass-statistics XLA
    formulation with a custom VJP (the naive lowering materialised f32
    copies — ~70% of U-Net forward time); a Pallas kernel exists behind
    NEUROCLEAR_PALLAS=1 but measured slower in-graph (layout round-trips
    at the kernel boundary) and is opt-in until its layout-aware rewrite.
    """

    dim: int
    eps: float = 1e-5

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.pallas_ops import instance_norm

        assert x.ndim == self.dim + 2, (x.shape, self.dim)
        return instance_norm(x)


def relu(x):
    return jax.nn.relu(x)


def leaky_relu(x, slope: float = 0.2):
    return jax.nn.leaky_relu(x, slope)


def sigmoid(x):
    return jax.nn.sigmoid(x)


# ---------------------------------------------------------------------------
# Param-tree utilities
# ---------------------------------------------------------------------------


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def flatten_params(params, prefix: str = "") -> Dict[str, np.ndarray]:
    """Nested dict -> flat { 'a.b.w': array } (checkpoint format)."""
    out = {}
    for k, v in params.items():
        key = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten_params(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def unflatten_params(flat: Dict[str, np.ndarray]):
    root: dict = {}
    for key, v in flat.items():
        parts = key.split(".")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return root
