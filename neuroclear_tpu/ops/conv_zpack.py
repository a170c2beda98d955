"""Output-z-pair packed 3x3x3 convolution — the 64-output-channel MXU fix.

Why: XLA's TPU conv emitter maps output channels onto the 128-wide MXU
result lanes, so the U-Net's cout=64 3x3x3 convolutions (double_conv1 /
ex_conv1_1 — ~86% of conv time; reference models/networks.py:478-538) run at
half output width: measured 37-41 TFLOP/s on v5e vs ~97 for 128-channel
convs (docs/PERFORMANCE.md, round-2 kernel study).

The fix needs no Pallas: express the conv so its OUTPUT is 128 channels
wide by computing two consecutive output z-slices per window position.

    out[2t]   = sum_dz w[dz] * x[2t-1+dz]      (dz in 0..2)
    out[2t+1] = sum_dz w[dz] * x[2t+dz]

Both are windows of the four input planes x[2t-1 .. 2t+2], so a single
(4, 3, 3, cin, 2*cout) kernel with stride (2, 1, 1) produces both at once:

    wp[0:3, :, :, :, :cout]  = w        (the even-z output)
    wp[1:4, :, :, :, cout:]  = w        (the odd-z output)

The packed kernel is 75% dense (each output column uses 27 of 36 taps) but
runs at the 128-wide machine rate — a net win whenever the machine-rate
gain exceeds 4/3.  The zero blocks are rebuilt from `w` on every call, so
jax.grad flows through the construction (tied weights sum their
gradients); no custom VJP is required and numerics match the direct conv
up to reduction reassociation.

Scope: kernel 3x3x3, stride 1, symmetric padding 1 (SAME), NDHWC, even D.
Enabled for bf16 compute via nn/core.py dispatch (NEUROCLEAR_ZPACK=0
disables).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# default OFF until the hardware measurement lands (docs/PERFORMANCE.md);
# flipped to "1" when the packed path beats the XLA emitter in-graph
ENABLED = os.environ.get("NEUROCLEAR_ZPACK", "0") == "1"


def supported(x_shape, cin: int, cout: int, k: int, stride: int,
              pad: int, dim: int) -> bool:
    if dim != 3 or k != 3 or stride != 1 or pad != 1:
        return False
    if len(x_shape) != 5:
        return False
    d = x_shape[1]
    if d % 2 or d < 4:
        return False
    # the win is the output-lane packing: only sub-128 cout qualifies, and
    # the 4/3 padding-FLOP overhead needs a wide MXU payoff -> cout == 64
    # (the production U-Net's hot layers); cin is free.
    return cout == 64


def conv3d_zpack2(x: jnp.ndarray, w: jnp.ndarray,
                  precision=None) -> jnp.ndarray:
    """x: (B, D, H, W, cin); w: (3, 3, 3, cin, cout) -> (B, D, H, W, cout).

    Equivalent to lax.conv_general_dilated(x, w, (1,1,1), pad 1, NDHWC).
    """
    B, D, H, W, cin = x.shape
    cout = w.shape[-1]
    assert w.shape[:3] == (3, 3, 3) and D % 2 == 0

    wp = jnp.zeros((4, 3, 3, cin, 2 * cout), w.dtype)
    wp = wp.at[0:3, :, :, :, :cout].set(w)
    wp = wp.at[1:4, :, :, :, cout:].set(w)

    xp = jnp.pad(x, ((0, 0), (1, 2), (0, 0), (0, 0), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp, wp,
        window_strides=(2, 1, 1),
        padding=((0, 0), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        precision=precision,
    )  # (B, D//2, H, W, 2*cout): channel block 0 = even z, block 1 = odd z
    y = y.reshape(B, D // 2, H, W, 2, cout)
    y = jnp.moveaxis(y, 4, 2).reshape(B, D, H, W, cout)
    return y
