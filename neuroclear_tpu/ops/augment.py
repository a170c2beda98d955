"""Fused on-device augmentation chain.

The reference's production preprocess
``random3Drotate_randomcrop_randomflip_addColorChannel_addBatchChannel``
(README.md:128) runs per-slice cv2 rotation + inscribed-rect crop + random
crop + /65535 + random flips on the *host*, per iteration — the CPU hot spot
of train_onecube (SURVEY §3.1).

Here the whole chain is one jitted gather program on the TPU:
  * the source volume stays resident in HBM (uint16), uploaded once;
  * rotate + inscribed-crop + random-crop collapse into a single bilinear
    gather of exactly crop_size voxels (the rotation is in-plane XY, so one
    2D coordinate map serves every Z slice);
  * normalisation happens on the gathered values; flips are index flips.

Output shapes are static (crop_size), so one compiled program serves every
angle — no retrace churn.  Distributional parity with the host chain
(data/base_dataset.py:87-131) is exact in geometry (same int truncations via
ops/rotation.py) and bilinear up to cv2's fixed-point interpolation rounding.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp

from .rotation import rotation_geometry


def augment_core(
    rng: jax.Array,
    vol: jnp.ndarray,
    crop_size: Tuple[int, int, int],
    inv_scale: float,
    do_rotate: bool = True,
    do_rot90: bool = False,
    do_flip: bool = True,
) -> jnp.ndarray:
    """Sample one augmented crop from a (Z, Y, X) volume -> (cz, cy, cx) f32.

    RNG draws mirror the host chain call-for-call: angle ~ U{0..359}
    (base_dataset.py:454), crop offsets ~ U[0, extent-crop] inclusive
    (:195-197), flips: each axis w.p. 1/2 (:279-289, whose shuffled-pop
    scheme is distribution-equal to independent per-axis coin flips).

    Unjitted core, so callers can wrap it (jit / vmap for the data-parallel
    batched sampler) without nesting jits.
    """
    cz, cy, cx = crop_size
    Z, Y, X = vol.shape
    k_angle, k_z, k_y, k_x, k_f = jax.random.split(rng, 5)

    if do_rotate:
        angle = jax.random.randint(k_angle, (), 0, 360).astype(jnp.float32)
        rotate = True
    elif do_rot90:
        k = jax.random.randint(k_angle, (), 0, 6)
        angle = jnp.asarray([-90.0, 90.0, -180.0, 180.0, -270.0, 270.0])[k]
        rotate = True
    else:
        angle = jnp.float32(0.0)
        rotate = False

    if rotate:
        geom = rotation_geometry(jnp.float32(X), jnp.float32(Y), angle, xp=jnp)
        crop_h, crop_w = geom.crop_h, geom.crop_w
    else:
        crop_h, crop_w = jnp.int32(Y), jnp.int32(X)

    # random crop offsets (inclusive upper bound, as python random.randint)
    z0 = jax.random.randint(k_z, (), 0, Z - cz + 1)
    y0 = jax.random.randint(k_y, (), 0, crop_h - cy + 1)
    x0 = jax.random.randint(k_x, (), 0, crop_w - cx + 1)

    out = sample_rotated_crop(vol, angle, (z0, y0, x0), crop_size, inv_scale,
                              rotate=rotate)
    if do_flip:
        flips = jax.random.uniform(k_f, (3,)) < 0.5
        out = jnp.where(flips[0], out[::-1, :, :], out)
        out = jnp.where(flips[1], out[:, ::-1, :], out)
        out = jnp.where(flips[2], out[:, :, ::-1], out)
    return out


fused_augment = jax.jit(
    augment_core,
    static_argnames=("crop_size", "inv_scale", "do_rotate", "do_rot90", "do_flip"),
)


@functools.partial(
    jax.jit,
    static_argnames=("crop_size", "inv_scale", "do_rotate", "do_rot90", "do_flip"),
)
def fused_augment_batch(rngs, vol, crop_size, inv_scale,
                        do_rotate=True, do_rot90=False, do_flip=True):
    """(n, 2) keys + (Z, Y, X) volume -> (n, cz, cy, cx, 1) f32 batch.

    One compiled program draws every device's crop; under a 'data'-sharded
    output each mesh device gathers only its own crop from its (replicated)
    volume copy — no host round-trips per iteration (the data-parallel
    replacement for the reference's DataParallel scatter,
    models/networks.py:132-135)."""
    out = jax.vmap(
        lambda k: augment_core(k, vol, crop_size, inv_scale,
                               do_rotate=do_rotate, do_rot90=do_rot90,
                               do_flip=do_flip))(rngs)
    return out[..., None]


def sample_rotated_crop(vol, angle, offsets, crop_size, inv_scale, rotate=True):
    """Deterministic core: gather a crop of the rotated-and-inscribed-cropped
    volume at integer offsets (z0, y0, x0).  Equivalent to
    rotate_clean_3d_xy(vol, angle)[z0:z0+cz, y0:.., x0:..] * inv_scale."""
    cz, cy, cx = crop_size
    Z, Y, X = vol.shape

    if rotate:
        geom = rotation_geometry(jnp.float32(X), jnp.float32(Y),
                                 jnp.asarray(angle, jnp.float32), xp=jnp)
        x1, y1 = geom.x1, geom.y1
        inv = geom.inv
    else:
        x1 = y1 = jnp.int32(0)
        inv = (jnp.float32(1), jnp.float32(0), jnp.float32(0),
               jnp.float32(0), jnp.float32(1), jnp.float32(0))

    z0, y0, x0 = offsets
    # canvas coords of the output crop
    py = (y1 + y0 + jnp.arange(cy)).astype(jnp.float32)[:, None]  # (cy, 1)
    px = (x1 + x0 + jnp.arange(cx)).astype(jnp.float32)[None, :]  # (1, cx)
    i00, i01, i02, i10, i11, i12 = inv
    sx = i00 * px + i01 * py + i02  # (cy, cx)
    sy = i10 * px + i11 * py + i12

    xf = jnp.floor(sx)
    yf = jnp.floor(sy)
    wx = (sx - xf)[None, :, :]
    wy = (sy - yf)[None, :, :]
    x0i = jnp.clip(xf.astype(jnp.int32), 0, X - 1)
    x1i = jnp.clip(x0i + 1, 0, X - 1)
    y0i = jnp.clip(yf.astype(jnp.int32), 0, Y - 1)
    y1i = jnp.clip(y0i + 1, 0, Y - 1)

    # Gather from a LOCAL (cz, Wy, Wx) window around the rotated crop's
    # source bounding box rather than the whole (cz, Y, X) z-slab: the
    # source coords are an affine map of the crop window, so their bbox is
    # bounded by the crop diagonal regardless of angle.  Bit-identical
    # samples (the weights/indices only shift by the integer window origin)
    # at an order less gather source — a pathology guard for runtimes whose
    # big-source gathers fall off a performance cliff (observed: a session
    # where full-plane gathers cost ~15 s flat).
    diag = int(math.ceil(math.hypot(cy, cx))) + 3
    Wy = min(Y, diag)
    Wx = min(X, diag)
    y_lo = jnp.clip(jnp.min(y0i), 0, Y - Wy)
    x_lo = jnp.clip(jnp.min(x0i), 0, X - Wx)
    loc = jax.lax.dynamic_slice(vol, (z0, y_lo, x_lo), (cz, Wy, Wx))
    y0l, y1l = y0i - y_lo, y1i - y_lo
    x0l, x1l = x0i - x_lo, x1i - x_lo
    v00 = loc[:, y0l, x0l].astype(jnp.float32)
    v01 = loc[:, y0l, x1l].astype(jnp.float32)
    v10 = loc[:, y1l, x0l].astype(jnp.float32)
    v11 = loc[:, y1l, x1l].astype(jnp.float32)
    out = ((v00 * (1 - wx) + v01 * wx) * (1 - wy)
           + (v10 * (1 - wx) + v11 * wx) * wy)
    return out * inv_scale


# ---------------------------------------------------------------------------
# Host-window sampling: the same augmented-crop math WITHOUT the volume in
# HBM.  The PRNG draws run on the host CPU backend (threefry is
# backend-deterministic, so given the same key they produce the same values
# as the on-device chain), the rotation geometry runs in host numpy, and
# only the ~(cz, diag, diag) gather window (~13 MB at 148^3) is uploaded
# per crop.  Built for HBM-critical runs — at the 8x148^3 --grad_accum
# production point the 686 MB resident volume was the difference between
# fitting the 16 GB v5e and RESOURCE_EXHAUSTED.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit,
                   static_argnames=("crop_size", "inv_scale", "vol_yx"))
def _window_sample(window, inv6, py0, px0, y_lo, x_lo, flips, *,
                   crop_size, inv_scale, vol_yx):
    """Bilinear gather of one rotated crop from a host-sliced window.

    Mirrors sample_rotated_crop exactly — global source indices are
    computed from the SAME affine map (inv6, canvas origin py0/px0) and
    clipped to the full-volume extents (vol_yx), then re-based onto the
    window via its origin (y_lo, x_lo); the plan guarantees coverage, the
    extra clip is a safety net."""
    cz, cy, cx = crop_size
    Y, X = vol_yx
    Wy, Wx = window.shape[1], window.shape[2]

    py = (py0 + jnp.arange(cy)).astype(jnp.float32)[:, None]
    px = (px0 + jnp.arange(cx)).astype(jnp.float32)[None, :]
    i00, i01, i02, i10, i11, i12 = inv6
    sx = i00 * px + i01 * py + i02
    sy = i10 * px + i11 * py + i12

    xf = jnp.floor(sx)
    yf = jnp.floor(sy)
    wx = (sx - xf)[None, :, :]
    wy = (sy - yf)[None, :, :]
    x0i = jnp.clip(xf.astype(jnp.int32), 0, X - 1)
    x1i = jnp.clip(x0i + 1, 0, X - 1)
    y0i = jnp.clip(yf.astype(jnp.int32), 0, Y - 1)
    y1i = jnp.clip(y0i + 1, 0, Y - 1)

    y0l = jnp.clip(y0i - y_lo, 0, Wy - 1)
    y1l = jnp.clip(y1i - y_lo, 0, Wy - 1)
    x0l = jnp.clip(x0i - x_lo, 0, Wx - 1)
    x1l = jnp.clip(x1i - x_lo, 0, Wx - 1)
    v00 = window[:, y0l, x0l].astype(jnp.float32)
    v01 = window[:, y0l, x1l].astype(jnp.float32)
    v10 = window[:, y1l, x0l].astype(jnp.float32)
    v11 = window[:, y1l, x1l].astype(jnp.float32)
    out = ((v00 * (1 - wx) + v01 * wx) * (1 - wy)
           + (v10 * (1 - wx) + v11 * wx) * wy) * inv_scale

    out = jnp.where(flips[0], out[::-1, :, :], out)
    out = jnp.where(flips[1], out[:, ::-1, :], out)
    out = jnp.where(flips[2], out[:, :, ::-1], out)
    return out


@functools.partial(jax.jit, static_argnames=("vol_shape", "crop_size",
                                             "do_rotate", "do_rot90",
                                             "do_flip"))
def _plan_draws(keys, *, vol_shape, crop_size, do_rotate, do_rot90, do_flip):
    """The PRNG draws of augment_core for a batch of keys, as ONE tiny
    device program (this environment exposes no CPU backend, so the
    backend-deterministic draws run where the chain would and are pulled
    to the host in a single transfer)."""
    cz, cy, cx = crop_size
    Z, Y, X = vol_shape

    def one(key):
        k_angle, k_z, k_y, k_x, k_f = jax.random.split(key, 5)
        if do_rotate:
            angle = jax.random.randint(k_angle, (), 0, 360).astype(jnp.float32)
        elif do_rot90:
            k = jax.random.randint(k_angle, (), 0, 6)
            angle = jnp.asarray([-90.0, 90.0, -180.0, 180.0, -270.0, 270.0])[k]
        else:
            angle = jnp.float32(0.0)
        if do_rotate or do_rot90:
            geom = rotation_geometry(jnp.float32(X), jnp.float32(Y), angle,
                                     xp=jnp)
            crop_h, crop_w = geom.crop_h, geom.crop_w
        else:
            crop_h, crop_w = jnp.int32(Y), jnp.int32(X)
        z0 = jax.random.randint(k_z, (), 0, Z - cz + 1)
        y0 = jax.random.randint(k_y, (), 0, crop_h - cy + 1)
        x0 = jax.random.randint(k_x, (), 0, crop_w - cx + 1)
        if do_flip:
            flips = jax.random.uniform(k_f, (3,)) < 0.5
        else:
            flips = jnp.zeros((3,), bool)
        return angle, z0, y0, x0, flips

    return jax.vmap(one)(keys)


def host_window_plan(keys, vol_shape, crop_size, do_rotate=True,
                     do_rot90=False, do_flip=True):
    """Pull the (n,) batch of augment draws to the host: list of
    (angle, z0, y0, x0, flips) python/numpy values."""
    import numpy as np

    a, z, y, x, f = _plan_draws(jnp.asarray(np.asarray(keys)),
                                vol_shape=tuple(vol_shape),
                                crop_size=tuple(crop_size),
                                do_rotate=do_rotate, do_rot90=do_rot90,
                                do_flip=do_flip)
    return [(float(ai), int(zi), int(yi), int(xi), np.asarray(fi))
            for ai, zi, yi, xi, fi in
            zip(np.asarray(a), np.asarray(z), np.asarray(y), np.asarray(x),
                np.asarray(f))]


def host_window_sample(key_or_draw, vol_np, crop_size, inv_scale,
                       do_rotate=True, do_rot90=False, do_flip=True):
    """augment_core semantics with the volume in HOST memory.

    `key_or_draw` is either a (2,) uint32 PRNG key or a pre-pulled
    (angle, z0, y0, x0, flips) tuple from host_window_plan.  Returns the
    (cz, cy, cx) f32 crop on the default device."""
    import numpy as np

    cz, cy, cx = crop_size
    Z, Y, X = vol_np.shape
    if isinstance(key_or_draw, tuple):
        angle, z0, y0, x0, flips = key_or_draw
    else:
        (angle, z0, y0, x0, flips), = host_window_plan(
            np.asarray(key_or_draw)[None], vol_np.shape, crop_size,
            do_rotate=do_rotate, do_rot90=do_rot90, do_flip=do_flip)

    # host geometry for the window origin + the affine passed to the
    # device gather; 1-ULP host/device float differences only ever move a
    # border-clamped voxel to its neighbour (see the parity test)
    if do_rotate or do_rot90:
        geom = rotation_geometry(np.float32(X), np.float32(Y),
                                 np.float32(angle), xp=np)
        y1, x1 = int(geom.y1), int(geom.x1)
        inv6 = np.asarray(geom.inv, np.float32)
    else:
        y1 = x1 = 0
        inv6 = np.asarray([1, 0, 0, 0, 1, 0], np.float32)

    # window origin from the affine corners (+ margin; the -2/-(span+4)
    # slack absorbs host-vs-device 1-ULP float differences in the map)
    py0, px0 = y1 + y0, x1 + x0
    pys = np.asarray([py0, py0 + cy - 1], np.float32)
    pxs = np.asarray([px0, px0 + cx - 1], np.float32)
    sx_c = inv6[0] * pxs[None, :] + inv6[1] * pys[:, None] + inv6[2]
    sy_c = inv6[3] * pxs[None, :] + inv6[4] * pys[:, None] + inv6[5]
    diag = int(math.ceil(math.hypot(cy, cx))) + 5
    Wy = min(Y, diag)
    Wx = min(X, diag)
    y_lo = int(np.clip(math.floor(sy_c.min()) - 2, 0, Y - Wy))
    x_lo = int(np.clip(math.floor(sx_c.min()) - 2, 0, X - Wx))

    window = np.ascontiguousarray(vol_np[z0:z0 + cz, y_lo:y_lo + Wy,
                                         x_lo:x_lo + Wx])
    return _window_sample(jnp.asarray(window), jnp.asarray(inv6),
                          jnp.int32(py0), jnp.int32(px0),
                          jnp.int32(y_lo), jnp.int32(x_lo),
                          jnp.asarray(flips),
                          crop_size=crop_size, inv_scale=inv_scale,
                          vol_yx=(Y, X))


def dtype_inv_scale(dtype) -> float:
    """__normalize parity (base_dataset.py:134-143): uint8 -> /255,
    uint16 -> /65535; floats pass through (the reference NameErrors on
    float inputs — documented fix)."""
    import numpy as np

    if dtype == np.uint8:
        return 1.0 / (2 ** 8 - 1.0)
    if dtype == np.uint16:
        return 1.0 / (2 ** 16 - 1.0)
    return 1.0
