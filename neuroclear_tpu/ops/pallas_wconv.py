"""Pallas TPU kernel for the W-pair lane-packed 3x3x3 convolution.

Same math as ops/conv_wpack.py (see its docstring for the derivation): the
minor spatial dim W is folded into the channel lanes on both sides, turning
the U-Net's hot cout=64 convolutions (reference models/networks.py:478-538)
into 18 fully lane-dense (K = 2*cin, N = 2*cout = 128) MXU matmuls per
(z, row-strip) tile at 75% useful FLOPs.

This kernel exists as the measured fallback for the case where XLA's conv
emitter does not reach machine rate on the packed (3,3,2) formulation.  It
is written layout-aware where round 2's attempt (ops/pallas_conv.py) was
rejected by Mosaic:

  * the HBM input's two minor dims are (Sp, 2*cin) with Sp padded to the
    sublane tile (16 for bf16) and 2*cin a lane multiple (128/256) — every
    DMA window is tile-aligned;
  * all kernel-side slicing is on LEADING dims (z, y taps), except one
    static +-1 sublane shift on the packed-S dim, materialised once per
    program (two shifted views) rather than per tap.

Public entry `conv3d_wpack_pallas` carries a custom VJP whose backward is
the XLA transposed-conv formulation, so it trains under jax.grad.
Enable with NEUROCLEAR_PALLAS_WCONV=1 (auto-falls back to the XLA packed
formulation off-TPU).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from .conv_wpack import conv3d_wpack2, pack_weights

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

# Tri-state enable: env "1" forces on, "0" forces off; unset defers to the
# runtime switch, which the forward-only surfaces (test_dice, bench) flip on.
# Not default-on for training: the packed-layout temporaries (~1.5 GB peak
# at 148^3) OOM next to the ~15 GB remat train step (measured, RESOURCE_
# EXHAUSTED); opt in with the env var for smaller crops.
_ENV = os.environ.get("NEUROCLEAR_PALLAS_WCONV")
ENABLED = _ENV == "1"
_INTERPRET = os.environ.get("NEUROCLEAR_PALLAS_INTERPRET", "0") == "1"


def set_enabled(on: bool) -> None:
    """Runtime enable (used by forward-only CLIs); env var overrides."""
    global ENABLED
    if _ENV is None:
        ENABLED = bool(on)

_VMEM_BUDGET = 10 * 1024 * 1024


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _pick_th(h: int, sp: int, lanes: int, itemsize: int, nout: int = 128):
    """Largest row-strip height dividing h that keeps the working set
    (haloed input strip x2 shifted views + f32 accumulator) under budget."""
    best = None
    for th in range(1, min(h, 48) + 1):
        if h % th:
            continue
        strip = 3 * (th + 2) * sp * lanes * itemsize
        acc = th * (sp - 1) * nout * 4
        # 2 DMA slots + 2 materialised shifted views + f32 accumulator
        if 4 * strip + acc <= _VMEM_BUDGET:
            best = th
    return best


def _plan(h: int, sp: int, lanes: int, itemsize: int, nout: int = 128):
    """Best (padded_h, th) strip plan.  H itself may only admit tiny strip
    heights (148 = 4 * 37: th=37 blows the VMEM budget at Sp=96, leaving
    th=4 whose per-program DMA/launch overhead dominates — measured 31 vs
    65 TFLOP/s).  Padding a few garbage rows buys a divisor-rich height;
    cost model = padding waste x halo DMA amplification."""
    best = None
    for hp in range(h, h + 33):
        th = _pick_th(hp, sp, lanes, itemsize, nout)
        if th is None:
            continue
        cost = (hp / h) * ((th + 2) / th)
        if best is None or cost < best[0] - 1e-9:
            best = (cost, hp, th)
    if best is None:
        return None
    return best[1], best[2]


def supported(x_shape, cin: int, cout: int, k: int, stride: int,
              pad: int, dim: int) -> bool:
    if not (_HAS_PALLAS and ENABLED):
        return False
    if not (_on_tpu() or _INTERPRET):
        return False
    if dim != 3 or k != 3 or stride != 1 or pad != 1 or len(x_shape) != 5:
        return False
    b, d, h, w, _ = x_shape
    if w % 2 or w < 4 or h < 2:
        return False
    if cout != 64 or cin not in (64, 128):
        return False
    to = (w // 2 + 15) // 16 * 16
    sp = max((w + 2) // 2, to + 1)
    sp = (sp + 15) // 16 * 16
    return _plan(h, sp, 2 * cin, 2) is not None


def _kernel(x_hbm, w_ref, o_ref, scratch, sem, *, th, To, Sp, L, D, NH,
            N=128):
    """One program: output rows [hi*th, hi*th+th) of z-slice z of batch b.

    To is the compute extent of the packed-S dim, padded up to the sublane
    tile so Mosaic accepts the shifted views; the [T, To) tail is garbage
    that the wrapper crops.  The input strip is double-buffered: program n
    starts the DMA for program n+1 before computing, so the HBM fetch
    overlaps the 18 matmuls (TPU grids run sequentially, so scratch state
    carries across programs)."""
    p = pl.program_id(0)  # b * D + z
    hi = pl.program_id(1)
    n = p * NH + hi

    def dma_for(m, slot):
        bb = m // (D * NH)
        zz = (m // NH) % D
        hh = m % NH
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(zz, 3), pl.ds(hh * th, th + 2)],
            scratch.at[slot],
            sem.at[slot],
        )

    @pl.when(n == 0)
    def _():
        dma_for(0, 0).start()

    @pl.when(n + 1 < pl.num_programs(0) * NH)
    def _():
        dma_for(n + 1, (n + 1) % 2).start()

    dma_for(n, n % 2).wait()
    buf = scratch.at[n % 2]

    # the only sublane-dim slicing, done once: the two s-shifted views
    sv = (buf[:, :, 0:To, :], buf[:, :, 1:1 + To, :])

    acc = jnp.zeros((th, To, N), jnp.float32)
    j = 0
    for dz in range(3):
        for dy in range(3):
            for ds in range(2):
                lhs = sv[ds][dz, dy:dy + th]
                acc = acc + jax.lax.dot_general(
                    lhs, w_ref[j],
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                j += 1
    o_ref[:] = acc.reshape(1, th, To, N).astype(o_ref.dtype)


def _geom(x_shape, dtype):
    """Shared packed-layout geometry: (L, T, To, Sp) for an unpacked
    NDHWC input shape."""
    _B, _D, _H, W, cin = x_shape
    L = 2 * cin
    T = W // 2
    S = (W + 2) // 2
    sub = 16 if dtype == jnp.bfloat16 else 8
    To = (T + sub - 1) // sub * sub
    Sp = (max(S, To + 1) + sub - 1) // sub * sub
    return L, T, To, Sp


def _conv_pallas(x, w, packed_out=False):
    """x: (B, D, H, W, cin) bf16; w: (3, 3, 3, cin, cout), cout in
    {64, 128} (the backward's dx conv has cout = cin)."""
    B, D, H, W, cin = x.shape
    cout = w.shape[-1]
    N = 2 * cout
    L, T, To, Sp = _geom(x.shape, x.dtype)
    Hp, th = _plan(H, Sp, L, x.dtype.itemsize, N)
    dt = x.dtype

    xp = jnp.pad(x,
                 ((0, 0), (1, 1), (1, Hp - H + 1), (1, 2 * Sp - W - 1),
                  (0, 0)))
    X = xp.reshape(B, D + 2, Hp + 2, Sp, L)
    w2 = pack_weights(w.astype(dt)).reshape(18, L, N)

    kernel = functools.partial(_kernel, th=th, To=To, Sp=Sp, L=L, D=D,
                               NH=Hp // th, N=N)
    out = pl.pallas_call(
        kernel,
        grid=(B * D, Hp // th),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # packed x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # packed weights
        ],
        out_specs=pl.BlockSpec(
            (1, th, To, N),
            lambda p, hi: (p, hi, 0, 0),
        ),
        out_shape=jax.ShapeDtypeStruct((B * D, Hp, To, N), dt),
        scratch_shapes=[
            pltpu.VMEM((2, 3, th + 2, Sp, L), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_INTERPRET and not _on_tpu(),
    )(X, w2)
    cropped = out[:, :H, :T, :]
    if packed_out:
        return cropped.reshape(B, D, H, T, N)   # phase-0 packed
    return cropped.reshape(B, D, H, W, cout)


def _dw_kernel(x_hbm, g_ref, o_ref, scratch, sem, *, th, To, Sp, L, D, NH):
    """Weight-gradient reduction on the packed layout.  One program: the
    (th, To) output-row strip's contribution to all 18 packed weight
    blocks, accumulated into the revisited (18, L, 128) output block (TPU
    grids run sequentially, so the VMEM-resident accumulator carries
    across programs).  The x strips ride the same double-buffered DMA plan
    as the forward kernel; g arrives as a pipelined BlockSpec input."""
    p = pl.program_id(0)  # b * D + z
    hi = pl.program_id(1)
    n = p * NH + hi

    def dma_for(m, slot):
        bb = m // (D * NH)
        zz = (m // NH) % D
        hh = m % NH
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(zz, 3), pl.ds(hh * th, th + 2)],
            scratch.at[slot],
            sem.at[slot],
        )

    @pl.when(n == 0)
    def _():
        dma_for(0, 0).start()

    @pl.when(n + 1 < pl.num_programs(0) * NH)
    def _():
        dma_for(n + 1, (n + 1) % 2).start()

    dma_for(n, n % 2).wait()
    buf = scratch.at[n % 2]
    sv = (buf[:, :, 0:To, :], buf[:, :, 1:1 + To, :])

    @pl.when(n == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    gq = g_ref[0].reshape(th * To, 128)
    j = 0
    for dz in range(3):
        for dy in range(3):
            for ds in range(2):
                lhs = sv[ds][dz, dy:dy + th].reshape(th * To, L)
                o_ref[j] = o_ref[j] + jax.lax.dot_general(
                    lhs, gq, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                j += 1


def _dw_pallas(x, g):
    """dL/dw of the packed conv: x (B, D, H, W, cin) unpacked, g the
    phase-0 packed cotangent (B, D, H, W//2, 128).  Returns the true
    (3, 3, 3, cin, 64) gradient in f32 via the pack_weights adjoint."""
    B, D, H, W, cin = x.shape
    L, T, To, Sp = _geom(x.shape, x.dtype)
    Hp, th = _plan(H, Sp, L, x.dtype.itemsize)
    dt = x.dtype

    xp = jnp.pad(x,
                 ((0, 0), (1, 1), (1, Hp - H + 1), (1, 2 * Sp - W - 1),
                  (0, 0)))
    X = xp.reshape(B, D + 2, Hp + 2, Sp, L)
    # rows [H, Hp) / cols [T, To) of each program's g block must be ZERO
    # (the forward crops them as garbage; here they would pollute dw)
    gp = jnp.pad(g.reshape(B * D, H, T, 128),
                 ((0, 0), (0, Hp - H), (0, To - T), (0, 0)))

    kernel = functools.partial(_dw_kernel, th=th, To=To, Sp=Sp, L=L, D=D,
                               NH=Hp // th)
    dwp = pl.pallas_call(
        kernel,
        grid=(B * D, Hp // th),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # packed x stays in HBM
            pl.BlockSpec((1, th, To, 128), lambda p, hi: (p, hi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((18, L, 128), lambda p, hi: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((18, L, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 3, th + 2, Sp, L), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_INTERPRET and not _on_tpu(),
    )(X, gp)
    return _dw_unpack(dwp, cin)


def _dw_unpack(dwp, cin):
    """Adjoint of pack_weights: fold the (18, 2*cin, 128) packed-block
    gradient back onto the true (3, 3, 3, cin, 64) kernel (each true tap
    appears in exactly two (ds, wp, wo) slots)."""
    d7 = dwp.reshape(3, 3, 2, 2, cin, 2, 64)
    out = jnp.zeros((3, 3, 3, cin, 64), dwp.dtype)
    for ds in (0, 1):
        for wp in (0, 1):
            for wo in (0, 1):
                k = 2 * ds + wp - wo
                if 0 <= k <= 2:
                    out = out.at[:, :, k].add(d7[:, :, ds, wp, :, wo, :])
    return out


# Kill-switch for the Pallas backward (falls back to the XLA formulation)
_BWD_ENV = os.environ.get("NEUROCLEAR_PALLAS_WBWD", "1") == "1"


def _bwd_plans_ok(x_shape, dtype, cin):
    """Both backward kernels must have a strip plan: the dx conv reads the
    64-channel cotangent (L=128) and writes 2*cin lanes; dw rides the
    forward's plan."""
    _B, _D, H, W, _ = x_shape
    if W % 2 or W < 4 or H < 2:
        return False
    Lg, _t, _to, Spg = _geom((_B, _D, H, W, 64), dtype)
    Lx, _t, _to, Spx = _geom(x_shape, dtype)
    item = jnp.dtype(dtype).itemsize
    return (_plan(H, Spg, Lg, item, 2 * cin) is not None
            and _plan(H, Spx, Lx, item) is not None)


@jax.custom_vjp
def conv3d_wpack_pallas(x, w):
    """3x3x3 stride-1 SAME conv, NDHWC — W-pair packed Pallas kernel.
    The backward also runs as packed Pallas kernels when a strip plan
    exists (dx is itself a 3x3x3 conv with the flipped/transposed kernel;
    dw is the packed reduction kernel above), else the XLA transposed-conv
    formulation — either way it trains under jax.grad."""
    return _conv_pallas(x, w)


def _fwd(x, w):
    return _conv_pallas(x, w), (x, w)


def _bwd_xla(res, g):
    x, w = res
    w_flip = jnp.flip(w, axis=(0, 1, 2)).swapaxes(3, 4)
    dx = jax.lax.conv_general_dilated(
        g, w_flip.astype(g.dtype), window_strides=(1, 1, 1), padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    dw = jax.lax.conv_general_dilated(
        xp.transpose(4, 1, 2, 3, 0),      # Cin as batch
        g.transpose(1, 2, 3, 0, 4),       # B as input feature
        window_strides=(1, 1, 1), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    dw = dw.transpose(1, 2, 3, 0, 4)      # (3,3,3,Cin,Cout)
    return dx.astype(x.dtype), dw.astype(w.dtype)


def _bwd(res, g):
    x, w = res
    cin = x.shape[-1]
    if not (_BWD_ENV and _bwd_plans_ok(x.shape, x.dtype, cin)):
        return _bwd_xla(res, g)
    w_flip = jnp.flip(w, axis=(0, 1, 2)).swapaxes(3, 4)
    dx = _conv_pallas(g, w_flip.astype(g.dtype))
    b, d, h, ww, _ = g.shape
    dw = _dw_pallas(x, g.reshape(b, d, h, ww // 2, 128))
    return dx.astype(x.dtype), dw.astype(w.dtype)


conv3d_wpack_pallas.defvjp(_fwd, _bwd)


def _unpack_shape(xp_shape):
    b, d, h, t, l = xp_shape
    return (b, d, h, 2 * t, l // 2)


def supported_packed(xp_shape, cout: int) -> bool:
    """Support check for the packed-resident entry (phase-0 packed input
    (B, D, H, W//2, 2*cin))."""
    if len(xp_shape) != 5 or xp_shape[-1] % 2:
        return False
    u = _unpack_shape(xp_shape)
    return supported(u, u[-1], cout, 3, 1, 1, 3)


@jax.custom_vjp
def conv3d_wpack_pallas_packed(xp, w):
    """Packed-resident Pallas conv: phase-0 packed input
    (B, D, H, W//2, 2*cin) -> packed output (B, D, H, W//2, 2*cout).
    The unpack before the kernel's shifted-phase pad is a relabel; keeping
    the output packed skips the (2x larger, lane-padded) unpacked buffer
    entirely — see ops/packed_block.py."""
    return _conv_pallas(xp.reshape(_unpack_shape(xp.shape)), w,
                        packed_out=True)


def _fwd_packed(xp, w):
    return (_conv_pallas(xp.reshape(_unpack_shape(xp.shape)), w,
                         packed_out=True), (xp, w))


def _bwd_packed(res, g):
    xp, w = res
    b, d, h, t, _ = g.shape
    dx, dw = _bwd((xp.reshape(_unpack_shape(xp.shape)), w),
                  g.reshape(b, d, h, 2 * t, 64))
    return dx.reshape(xp.shape), dw


conv3d_wpack_pallas_packed.defvjp(_fwd_packed, _bwd_packed)


def conv3d_wpack_auto(x, w):
    """Pallas on TPU when enabled; XLA packed formulation elsewhere."""
    if supported(x.shape, x.shape[-1], w.shape[-1], 3, 1, 1, 3):
        return conv3d_wpack_pallas(x, w)
    return conv3d_wpack2(x, w)
