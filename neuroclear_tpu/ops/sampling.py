"""Random slice / MIP extraction from 5-D volumes — the jit-safe equivalents
of the reference's `Volume.get_slice` / `Volume.get_projection`
(models/axial_to_lateral_gan_apollo_model.py:322-351).

Volumes are NDHWC: (N, Z, Y, X, C).  ``axis`` follows the reference
convention: 0 = lateral (slice over Z -> XY image), 1 = axial_1 (slice over Y
-> XZ), 2 = axial_2 (slice over X -> YZ).

TPU-first notes:
  * All randomness is explicit (jax PRNG keys threaded by the train step);
    every call site re-samples, matching the reference's load-bearing
    fresh-randomness-per-call (SURVEY §3.4).
  * `random_projection` supports a *traced* projection depth (the
    --randomize_projection_depth path) with static shapes: instead of a
    dynamic-size window + max, we mask the full axis with -inf outside
    [start, start+depth) and reduce — identical result, fixed shapes.

Deviation (documented): the reference's Volume.num_slice is always
``shape[-1]`` even when slicing other axes (apollo_model.py:325) — correct
only for cubic crops, which all shipped configs use.  We use the true extent
of the sliced axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _spatial_axis(axis: int) -> int:
    return axis + 1  # NDHWC: spatial dims start at 1


def random_slice(rng: jax.Array, vol: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Pick one random slice along `axis` -> (N, h, w, C)."""
    ax = _spatial_axis(axis)
    n = vol.shape[ax]
    idx = jax.random.randint(rng, (), 0, n)
    sl = jax.lax.dynamic_index_in_dim(vol, idx, axis=ax, keepdims=False)
    return sl


def random_projection(rng: jax.Array, vol: jnp.ndarray, depth, axis: int,
                      max_depth: int | None = None) -> jnp.ndarray:
    """Max-intensity projection over a random contiguous window of `depth`
    slices along `axis` -> (N, h, w, C).

    `depth` may be a python int or a traced scalar; start is sampled from
    [0, n - depth) exactly as np.random.randint(0, num_slice - depth)
    (apollo_model.py:340).
    """
    ax = _spatial_axis(axis)
    n = vol.shape[ax]
    start = jax.random.randint(rng, (), 0, n - depth)  # maxval exclusive, as np
    pos = jnp.arange(n)
    mask = (pos >= start) & (pos < start + depth)
    shape = [1] * vol.ndim
    shape[ax] = n
    mask = mask.reshape(shape)
    neg = jnp.asarray(-jnp.inf, vol.dtype)
    return jnp.max(jnp.where(mask, vol, neg), axis=ax)


def all_slices(vol: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Move `axis` into the batch dim: (N, Z, Y, X, C) -> (N*n, h, w, C).

    The TPU-native equivalent of Athena's iter_f loop over every slice
    (athena_model.py:286-296): one big batched 2D conv instead of n small
    ones.
    """
    ax = _spatial_axis(axis)
    v = jnp.moveaxis(vol, ax, 1)  # (N, n, h, w, C)
    return v.reshape((-1,) + v.shape[2:])
