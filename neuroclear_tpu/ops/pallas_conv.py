"""Pallas TPU kernel for the U-Net's 64-channel 3x3x3 convolutions.

Why: XLA's conv emitter maps both the input-channel (K) and output-channel
(N) dimensions of a 64-channel 3D conv onto the 128-wide MXU, wasting half
of each — measured ~38 TFLOP/s on v5e vs ~200 for 128-channel convs
(docs/PERFORMANCE.md).  These layers are ~55% of U-Net FLOPs and ~86% of its
conv *time* (reference network: models/networks.py:478-538 `double_conv1`,
`ex_conv1_1`).

The kernel reformulates the conv as one MXU matmul per output tile with a
DENSE contraction dimension: an im2col strip is built in VMEM from a single
haloed DMA of the (z-1, z, z+1) row band, giving

    (T_h * W, 27 * C_in) @ (27 * C_in, C_out)

so only the N=64 half-width remains (~2x the XLA formulation on these
layers).  Geometry: NDHWC, kernel 3x3x3, stride 1, SAME padding — exactly
the production double_conv shape (nn/generators.py).

The public entry `conv3d_3x3` carries a custom VJP whose backward pass uses
the standard XLA transposed-conv formulation, so the kernel is usable under
jax.grad (training) as well as in the inference pipeline.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


# default OFF until benchmarked on hardware; flip to "1" default once the
# in-graph measurement beats the XLA emitter (tracked in docs/PERFORMANCE.md)
_ENABLE = os.environ.get("NEUROCLEAR_PALLAS_CONV", "0") == "1"
_INTERPRET = os.environ.get("NEUROCLEAR_PALLAS_INTERPRET", "0") == "1"

# VMEM budget for the im2col strip (bytes); T_h is chosen to stay under it.
_IM2COL_BUDGET = 6 * 1024 * 1024


def supported(x_shape, w_shape, stride, padding, dilation) -> bool:
    """True when (shape, geometry) qualifies for the Pallas kernel."""
    if not (_HAS_PALLAS and _ENABLE):
        return False
    if not (_on_tpu() or _INTERPRET):
        return False
    if len(x_shape) != 5 or len(w_shape) != 5:
        return False
    kd, kh, kw, cin, cout = w_shape
    if (kd, kh, kw) != (3, 3, 3):
        return False
    if tuple(stride) != (1, 1, 1) or tuple(dilation) != (1, 1, 1):
        return False
    if padding not in ("SAME", ((1, 1), (1, 1), (1, 1))):
        return False
    # dense-K payoff needs lane-width channels; tiny widths stay on XLA
    if cin % 32 != 0 or cout % 32 != 0 or cout > 128:
        return False
    b, d, h, w, _ = x_shape
    if h < 4 or w < 32:
        return False
    return _pick_th(h, w, cin) is not None


def _pick_th(h: int, w: int, cin: int):
    """Largest row-tile T_h (<=16) dividing h whose im2col strip fits VMEM."""
    for th in (16, 8, 4, 2, 1):
        if h % th:
            continue
        if th * w * 27 * cin * 2 <= _IM2COL_BUDGET:
            return th
    return None


def _conv_kernel(x_hbm, w_ref, o_ref, scratch, sem, *, th, H, W, cin, cout, D):
    """One program: out rows [h0, h0+th) of z-slice z of batch b."""
    p = pl.program_id(0)  # b * D + z
    hi = pl.program_id(1)
    b = p // D
    z = p % D

    # one haloed DMA: rows of the 3 z-planes feeding this strip
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(z, 3), pl.ds(hi * th, th + 2)],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()

    # im2col: 27 shifted (th*W, cin) views -> (th*W, 27*cin), tap order
    # (dz, dy, dx) row-major to match the reshaped weights
    cols = []
    for dz in range(3):
        for dy in range(3):
            for dx in range(3):
                sl = scratch[dz, dy:dy + th, dx:dx + W, :]
                cols.append(sl.reshape(th * W, cin))
    im2col = jnp.concatenate(cols, axis=1)

    acc = jnp.dot(im2col, w_ref[:], preferred_element_type=jnp.float32)
    o_ref[:] = acc.reshape(1, th, W, cout).astype(o_ref.dtype)


def _conv3d_pallas(x, w):
    """x: (B, D, H, W, Cin) bf16/f32;  w: (3, 3, 3, Cin, Cout).
    Returns (B, D, H, W, Cout) in x.dtype (f32 accumulation)."""
    B, D, H, W, cin = x.shape
    cout = w.shape[-1]
    th = _pick_th(H, W, cin)
    dt = x.dtype

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    w2 = w.astype(dt).reshape(27 * cin, cout)

    grid = (B * D, H // th)
    kernel = functools.partial(_conv_kernel, th=th, H=H, W=W, cin=cin,
                               cout=cout, D=D)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # padded x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # reshaped weights
        ],
        out_specs=pl.BlockSpec(
            (1, th, W, cout),
            lambda p, hi: (p, hi, 0, 0),
        ),
        out_shape=jax.ShapeDtypeStruct((B * D, H, W, cout), dt),
        scratch_shapes=[
            pltpu.VMEM((3, th + 2, W + 2, cin), dt),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_INTERPRET and not _on_tpu(),
    )(xp, w2)
    return out.reshape(B, D, H, W, cout)


@jax.custom_vjp
def conv3d_3x3(x, w):
    """3x3x3 stride-1 SAME conv, NDHWC — Pallas dense-K kernel with an XLA
    transposed-conv backward (so it trains under jax.grad)."""
    return _conv3d_pallas(x, w)


def _fwd(x, w):
    return _conv3d_pallas(x, w), (x, w)


def _bwd(res, g):
    x, w = res
    # dx: full-correlation of g with w flipped in space, channels transposed
    w_flip = jnp.flip(w, axis=(0, 1, 2)).swapaxes(3, 4)
    dx = jax.lax.conv_general_dilated(
        g, w_flip, window_strides=(1, 1, 1), padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    # dw[kd,kh,kw,i,o] = sum_b,z,y,x  x[b, z+kd-1, y+kh-1, x+kw-1, i] * g[..., o]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    dw = jax.lax.conv_general_dilated(
        xp.transpose(4, 1, 2, 3, 0),      # Cin as batch
        g.transpose(1, 2, 3, 0, 4),       # B as input feature
        window_strides=(1, 1, 1), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    dw = dw.transpose(1, 2, 3, 0, 4)      # (3,3,3,Cin,Cout)
    return dx.astype(x.dtype), dw.astype(w.dtype)


conv3d_3x3.defvjp(_fwd, _bwd)
