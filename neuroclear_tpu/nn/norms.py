"""Norm-layer factory mirroring the reference's get_norm_layer.

Reference: models/networks.py:20-44 —
  * 'instance' (production): affine=False, no running stats.
  * 'batch': affine=True.  NOTE (documented deviation): we always normalise
    with the current batch statistics and do not track running stats; the
    shipped NeuroClear configs use instance norm everywhere, so this path only
    affects the optional '--norm batch' experiments.
  * 'spectral'/'none': identity (spectral norm is applied at the conv level in
    the *_SN discriminators, as in the reference).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .core import InstanceNorm, Params


@dataclasses.dataclass(frozen=True)
class NormSpec:
    kind: str  # 'instance' | 'batch' | 'none'
    dim: int

    @property
    def has_params(self) -> bool:
        return self.kind == "batch"

    def init(self, key, nc: int, init_gain: float = 0.02) -> Params:
        if self.kind != "batch":
            return {}
        # init_weights: BatchNorm weight ~ N(1.0, gain), bias = 0
        # (models/networks.py:114-116)
        return {
            "scale": 1.0 + jax.random.normal(key, (nc,)) * init_gain,
            "offset": jnp.zeros((nc,)),
        }

    def apply(self, params: Params, x: jnp.ndarray) -> jnp.ndarray:
        if self.kind == "instance":
            return InstanceNorm(self.dim).apply(x)
        if self.kind == "batch":
            axes = tuple(range(0, 1 + self.dim))  # over batch + spatial
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=axes, keepdims=True)
            var = jnp.mean(jnp.square(xf - mean), axis=axes, keepdims=True)
            y = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
            y = y * params["scale"] + params["offset"]
            return y.astype(x.dtype)
        return x


def get_norm_spec(norm_type: str, dim: int) -> NormSpec:
    if norm_type == "batch":
        return NormSpec("batch", dim)
    if norm_type == "instance":
        return NormSpec("instance", dim)
    if norm_type in ("spectral", "none"):
        return NormSpec("none", dim)
    raise NotImplementedError(f"normalization layer [{norm_type}] is not found")
