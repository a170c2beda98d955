"""W-pair lane-packed 3x3x3 convolution — dense-K *and* dense-N MXU fix.

Why: the U-Net's hot full-resolution convolutions (double_conv1 second conv
64->64 and ex_conv1_1 128->64; reference models/networks.py:478-538) run at
34-41 TFLOP/s on v5e vs 92 for 128-channel convs.  Round-3 measurements
(docs/PERFORMANCE.md) showed the limiter is the INPUT-channel side: XLA's
emitter pads cin=64 to 128 lanes, wasting half of every MXU pass, which is
why the output-only packing (ops/conv_zpack.py) measured *worse* (25
TFLOP/s) — it fixed the half that didn't govern.

This formulation packs the minor spatial dimension W into the channel lanes
on BOTH sides, and the packing is FREE: in an NDHWC layout, (W, C) are the
two minor dims, so

    x.pad(W+1,+1).reshape(B, D, H, (W+2)//2, 2*cin)

is a relabeling of the same HBM bytes (w-major, c-minor flattening), not a
relayout.  Each packed lane block holds original columns (2s-1, 2s).  The
3x3x3 conv then becomes a 3x3x2 conv over (D, H, S) with cin' = 2*cin and
cout' = 2*cout:

    out[2t + wo] = sum_{dz,dy,dw} w[dz,dy,dw] * x[.., 2t + wo + dw - 1, :]

and with input pairs s = t + ds holding xpad[2s + wp] (wp in {0,1}),
2t + wo + dw = 2(t+ds) + wp  =>  dw = 2*ds + wp - wo, giving the packed
kernel

    w2[dz, dy, ds, (wp, ci), (wo, co)] = w[dz, dy, 2*ds + wp - wo, ci, co]

with exactly 6 of 8 (ds, wp, wo) combinations in range — 75% useful FLOPs,
100% lane density on K and N.  Net ceiling: 0.75 x the 128-lane machine
rate (~69 TFLOP/s useful on v5e) vs the 34-41 of the direct emitter.

The output reshape (B, D, H, W/2, 2*cout) -> (B, D, H, W, cout) is again a
free relabeling (lane = wo*cout + co).  The zero blocks are rebuilt from
`w` each call, so jax.grad flows through the construction (no custom VJP);
numerics match the direct conv up to reduction reassociation.

Scope: kernel 3x3x3, stride 1, SAME padding, NDHWC, even W.  Enabled for
the production cout=64 layers via nn/core.py dispatch (NEUROCLEAR_WPACK=0
disables).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# default OFF until the hardware measurement lands (docs/PERFORMANCE.md)
ENABLED = os.environ.get("NEUROCLEAR_WPACK", "0") == "1"


def supported(x_shape, cin: int, cout: int, k: int, stride: int,
              pad: int, dim: int) -> bool:
    if dim != 3 or k != 3 or stride != 1 or pad != 1:
        return False
    if len(x_shape) != 5:
        return False
    w = x_shape[4 - 1]  # NDHWC minor spatial
    if w % 2 or w < 4:
        return False
    # the win needs both packed sides MXU-dense: 2*cout a lane multiple and
    # 2*cin at least one full lane tile -> the production 64->64 / 128->64
    return cout == 64 and cin in (64, 128)


def pack_weights(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, 3, cin, cout) -> (3, 3, 2, 2*cin, 2*cout) packed kernel."""
    cin, cout = w.shape[3], w.shape[4]
    w2 = jnp.zeros((3, 3, 2, 2, cin, 2, cout), w.dtype)
    for ds in (0, 1):
        for wp in (0, 1):
            for wo in (0, 1):
                dw = 2 * ds + wp - wo
                if 0 <= dw <= 2:
                    w2 = w2.at[:, :, ds, wp, :, wo, :].set(w[:, :, dw])
    return w2.reshape(3, 3, 2, 2 * cin, 2 * cout)


def conv3d_wpack2(x: jnp.ndarray, w: jnp.ndarray,
                  precision=None) -> jnp.ndarray:
    """x: (B, D, H, W, cin); w: (3, 3, 3, cin, cout) -> (B, D, H, W, cout).

    Equivalent to lax.conv_general_dilated(x, w, (1,1,1), pad 1, NDHWC).
    """
    B, D, H, W, cin = x.shape
    cout = w.shape[-1]
    assert w.shape[:3] == (3, 3, 3) and W % 2 == 0

    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 1), (0, 0)))
    X = xp.reshape(B, D, H, (W + 2) // 2, 2 * cin)   # free relabeling
    y = jax.lax.conv_general_dilated(
        X, pack_weights(w),
        window_strides=(1, 1, 1),
        padding=((1, 1), (1, 1), (0, 0)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        precision=precision,
    )  # (B, D, H, W//2, 2*cout)
    return y.reshape(B, D, H, W, cout)               # free relabeling


def conv3d_wpack2_packed(xp: jnp.ndarray, w: jnp.ndarray,
                         precision=None) -> jnp.ndarray:
    """Packed-resident variant: xp is the phase-0 W-pair packing
    (B, D, H, W//2, 2*cin) of an NDHWC tensor; returns the packed output
    (B, D, H, W//2, 2*cout).  Same math as conv3d_wpack2 — consecutive
    packed units (ops/packed_block.py) skip the per-conv unpack/repack so
    norms and activations between them run on the lane-dense layout."""
    B, D, H, T, L = xp.shape
    cin = L // 2
    W = 2 * T
    cout = w.shape[-1]
    assert w.shape[:3] == (3, 3, 3) and w.shape[3] == cin
    # rephase: the conv consumes the SHIFTED packing (pairs (2s-1, 2s)) —
    # unpack is a relabel, the pad is the one real copy per conv
    x = xp.reshape(B, D, H, W, cin)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 1), (0, 0)))
    X = x.reshape(B, D, H, T + 1, L)
    y = jax.lax.conv_general_dilated(
        X, pack_weights(w),
        window_strides=(1, 1, 1),
        padding=((1, 1), (1, 1), (0, 0)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        precision=precision,
    )  # (B, D, H, T, 2*cout) — already phase-0 packed
    return y
