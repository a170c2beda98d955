"""Rotation geometry for the random3Drotate augmentation.

The reference rotates every XY slice by a random angle with cv2, letting the
canvas grow, then centre-crops to the largest inscribed axis-aligned
rectangle (data/base_dataset.py:306-460).  We reproduce the *geometry* —
including every int() truncation — as traced scalar math, so the whole
augmentation can run on device with static output shapes.

Note on the reference's gamma quirk: largest_rotated_rect computes
``gamma = atan2(bb_w, bb_w)`` for both branches (base_dataset.py:393), i.e.
always pi/4.  For square slices (every shipped config: square XY extents)
pi/4 *is* the correct gamma, so we implement the correct formula; for
non-square inputs we deviate from the reference's buggy constant and compute
the true inscribed rectangle.
"""

from __future__ import annotations

import math
from typing import NamedTuple


class RotGeom(NamedTuple):
    """Integer geometry of rotate-then-inscribed-crop for one angle.

    All fields may be python ints (host) or traced int32 scalars (device).
    new_w/new_h: rotated canvas size; x1/y1: top-left of the inscribed crop
    in canvas coords; crop_w/crop_h: inscribed crop size;
    inv: 6-tuple row-major 2x3 inverse affine (canvas -> source coords).
    """

    new_w: object
    new_h: object
    x1: object
    y1: object
    crop_w: object
    crop_h: object
    inv: tuple
    fwd: tuple


def largest_rotated_rect(w, h, angle, xp=math):
    """Largest axis-aligned rectangle inside a w x h rect rotated by `angle`
    (radians).  Returns floats (wr, hr)."""
    if xp is math:
        floor, cos, sin, atan2, pi = math.floor, math.cos, math.sin, math.atan2, math.pi
    else:  # jnp / np
        floor, cos, sin, atan2, pi = xp.floor, xp.cos, xp.sin, xp.arctan2, math.pi

    quadrant = _int(floor(angle / (pi / 2)), xp) % 4
    odd = quadrant % 2
    sign_alpha = odd * (pi - angle) + (1 - odd) * angle if xp is not math else (
        angle if quadrant % 2 == 0 else pi - angle)
    alpha = (sign_alpha % pi + pi) % pi

    bb_w = w * cos(alpha) + h * sin(alpha)
    bb_h = w * sin(alpha) + h * cos(alpha)

    gamma = atan2(bb_w * 1.0, bb_h * 1.0)  # == pi/4 for square inputs
    delta = pi - alpha - gamma
    length = max(w, h) if xp is math else xp.maximum(w, h)
    d = length * cos(alpha)
    a = d * sin(alpha) / sin(delta)
    y = a * cos(gamma)
    x = y * xp.tan(gamma) if xp is not math else y * math.tan(gamma)
    return bb_w - 2 * x, bb_h - 2 * y


def _int(v, xp):
    if xp is math:
        return int(v)
    return v.astype("int32") if hasattr(v, "astype") else int(v)


def rotation_geometry(w: object, h: object, angle_deg, xp=math) -> RotGeom:
    """Full rotate_image + crop_around_center geometry for a W x H slice.

    Mirrors data/base_dataset.py:306-431: cv2.getRotationMatrix2D about
    (w/2, h/2), canvas growth with int truncation, integer translation, and
    the centre-crop int arithmetic.  `angle_deg` in degrees (cv2 convention:
    positive = counter-clockwise).
    """
    if xp is math:
        cos, sin, floor = math.cos, math.sin, math.floor
        to_int = int
    else:
        cos, sin, floor = xp.cos, xp.sin, xp.floor
        to_int = lambda v: xp.floor(v).astype("int32")  # operands are >= 0 here

    theta = angle_deg * math.pi / 180.0
    a, b = cos(theta), sin(theta)
    w2, h2 = w * 0.5, h * 0.5

    # canvas size: rotated corner extents (abs values -> symmetric)
    new_w = to_int(abs(w * a) + abs(h * b))
    new_h = to_int(abs(w * b) + abs(h * a))

    # integer translation of the cv2 affine (rotate about centre, recentre)
    tx = to_int(new_w * 0.5 - w2)
    ty = to_int(new_h * 0.5 - h2)

    # forward affine (src -> canvas): cv2 rot matrix + integer translation
    # M = [[a, b, (1-a)*cx - b*cy + tx], [-b, a, b*cx + (1-a)*cy + ty]]
    m02 = (1 - a) * w2 - b * h2 + tx
    m12 = b * w2 + (1 - a) * h2 + ty
    # inverse (canvas -> src): R^T (p - t) for the pure rotation part
    i00, i01 = a, -b
    i10, i11 = b, a
    i02 = -(i00 * m02 + i01 * m12)
    i12 = -(i10 * m02 + i11 * m12)

    # inscribed rectangle + crop_around_center int arithmetic
    wr, hr = largest_rotated_rect(w, h, theta % (2 * math.pi), xp)
    if xp is math:
        wr = min(wr, new_w)
        hr = min(hr, new_h)
        cx, cy = int(new_w * 0.5), int(new_h * 0.5)
        x1 = int(cx - wr * 0.5)
        x2 = int(cx + wr * 0.5)
        y1 = int(cy - hr * 0.5)
        y2 = int(cy + hr * 0.5)
    else:
        wr = xp.minimum(wr, new_w)
        hr = xp.minimum(hr, new_h)
        cx = to_int(new_w * 0.5)
        cy = to_int(new_h * 0.5)
        x1 = to_int(cx - wr * 0.5)
        x2 = to_int(cx + wr * 0.5)
        y1 = to_int(cy - hr * 0.5)
        y2 = to_int(cy + hr * 0.5)

    return RotGeom(new_w, new_h, x1, y1, x2 - x1, y2 - y1,
                   (i00, i01, i02, i10, i11, i12),
                   (a, b, m02, -b, a, m12))
