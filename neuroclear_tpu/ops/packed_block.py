"""Packed-resident conv blocks: keep the U-Net's hot full-resolution units
on the W-pair lane-packed layout BETWEEN ops, not just inside the conv.

ops/conv_wpack.py fixed the MXU rate of the cout=64 convolutions by folding
the minor spatial dim W into the channel lanes.  But as a per-conv rewrite
each call still unpacks its output to the NDHWC (…, W, 64) form, whose TPU
tiling pads C=64 to 128 lanes — so every instance norm, ReLU and skip copy
at full resolution moves 2x the bytes it needs to, and the pack/unpack
copies bracket every conv (the measured reason the Pallas W-conv stayed
forward-only: its ephemeral padded temporaries next to the ~15 GB remat
train step, docs/PERFORMANCE.md round 3).

This module keeps a ConvBlock's interior tensors in the phase-0 packing
(B, D, H, W//2, 2*C) — lane-dense, zero padding waste — and runs:

  * the conv: conv3d_wpack_pallas_packed (TPU) / conv3d_wpack2_packed (XLA)
    — the rephase pad is the one real copy per conv, the unpack relabel
    and the output's packed form are free;
  * instance norm + ReLU: ops/pallas_ops.instance_norm(fold=2) folds the
    statistics across the two lane copies (exactly equal to unpack ->
    norm -> repack) so the whole unit's elementwise traffic runs on the
    dense layout;
  * the bias add: per-cout bias tiled across the two lane copies.

Entry/exit packing of a block is a reshape of the minor dims.  Eligibility
mirrors the wpack kernel (3x3x3, stride 1, pad 1, even W, cout=64,
cin in {64, 128}) plus norm in {instance, none}; the reference's production
U-Net (unet_deconv: double_conv1 unit 2 and ex_conv1_1 — the layers that
are ~86% of conv time, reference models/networks.py:478-538) qualifies.

Gate: NEUROCLEAR_PACKED_BLOCK=1 forces on, =0 forces off; unset defers to
set_enabled (off by default until the hardware A/B lands).
"""

from __future__ import annotations

import os

import jax.numpy as jnp

from . import conv_wpack, pallas_wconv
from .pallas_ops import instance_norm_act

_ENV = os.environ.get("NEUROCLEAR_PACKED_BLOCK")
ENABLED = _ENV == "1"


def set_enabled(on: bool) -> None:
    """Runtime enable; the env var overrides."""
    global ENABLED
    if _ENV is None:
        ENABLED = bool(on)


def pack(x: jnp.ndarray) -> jnp.ndarray:
    """(B, D, H, W, C) -> phase-0 packed (B, D, H, W//2, 2C). A relabeling
    of the minor dims (w-major, c-minor)."""
    b, d, h, w, c = x.shape
    return x.reshape(b, d, h, w // 2, 2 * c)


def unpacked_shape(xp_shape) -> tuple:
    """Static shape of unpack(xp) without tracing a reshape."""
    b, d, h, t, l = xp_shape
    return (b, d, h, 2 * t, l // 2)


def unpack(xp: jnp.ndarray) -> jnp.ndarray:
    """Inverse of pack."""
    return xp.reshape(unpacked_shape(xp.shape))


def unit_supported(x_shape, in_c: int, out_c: int, k: int, stride: int,
                   pad: int, dim: int, norm_kind: str) -> bool:
    """May this conv->norm->act unit run packed-resident?  x_shape is the
    UNPACKED input shape (spatial dims are preserved by k3 s1 p1)."""
    if not ENABLED:
        return False
    if norm_kind not in ("instance", "none"):
        return False
    return conv_wpack.supported(x_shape, in_c, out_c, k, stride, pad, dim)


def conv_packed(xp: jnp.ndarray, w: jnp.ndarray, b=None) -> jnp.ndarray:
    """Packed-in/packed-out 3x3x3 SAME conv + bias: Pallas kernel on TPU
    when eligible, the XLA packed formulation elsewhere."""
    import jax

    cout = w.shape[-1]
    if pallas_wconv.supported_packed(xp.shape, cout):
        y = pallas_wconv.conv3d_wpack_pallas_packed(xp, w.astype(xp.dtype))
    else:
        # keep nn/core._conv_precision semantics: f32 inputs get true-f32
        # convolutions (XLA's DEFAULT silently computes f32 convs at bf16)
        prec = (jax.lax.Precision.HIGHEST if xp.dtype == jnp.float32
                else None)
        y = conv_wpack.conv3d_wpack2_packed(xp, w.astype(xp.dtype),
                                            precision=prec)
    if b is not None:
        y = y + jnp.tile(b, 2).astype(y.dtype)
    return y


def max_pool_packed(xp: jnp.ndarray) -> jnp.ndarray:
    """MaxPool3d(2) (stride 2, floor semantics) consuming the phase-0
    packed layout directly: the W pooling window IS the two lane copies,
    so the W reduction is one lane-half max on the dense layout and the
    packed tensor is never unpacked.  Returns the unpacked pooled tensor
    (B, D//2, H//2, W//2, C)."""
    import jax

    c = xp.shape[-1] // 2
    y = jnp.maximum(xp[..., :c], xp[..., c:])        # the W window
    dims = (1, 2, 2, 1, 1)                           # D, H remain
    return jax.lax.reduce_window(y, -jnp.inf, jax.lax.max, dims, dims,
                                 "VALID")


def norm_act_packed(xp: jnp.ndarray, norm_kind: str,
                    act: str | None = "relu") -> jnp.ndarray:
    """Instance norm (lane-folded stats) + activation on the packed layout."""
    if norm_kind == "instance":
        return instance_norm_act(xp, act, fold=2)
    if act == "relu":
        import jax

        return jax.nn.relu(xp)
    return xp
