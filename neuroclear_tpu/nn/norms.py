"""Norm-layer factory mirroring the reference's get_norm_layer.

Reference: models/networks.py:20-44 —
  * 'instance' (production): affine=False, no running stats.
  * 'batch': affine=True with running statistics (torch BatchNorm defaults,
    momentum 0.1).  Training normalises with the current batch statistics;
    eval mode (``--eval``) uses the checkpointed running mean/var.  Running
    stats live in the param tree as ``running_mean``/``running_var`` buffers
    (zero-gradient, so Adam leaves them untouched); during training they are
    refreshed by the models' post-step EMA pass (BaseModel.refresh_norm_stats)
    — the reference updates them on every torch forward instead; cadence is
    the documented deviation, the eval-mode contract is exact.
  * 'spectral'/'none': identity (spectral norm is applied at the conv level in
    the *_SN discriminators, as in the reference).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .core import InstanceNorm, Params

# Trace-time collector for batch statistics: when a list is installed here,
# every batch-norm apply() in the traced program appends
# (param_dict, batch_mean, batch_var).  Used by the EMA refresh pass.
_STATS_COLLECTOR: list | None = None

# Trace-time eval switch: programs traced while eval_mode() is active
# normalise with the checkpointed running statistics (torch eval()
# semantics for BatchNorm; a no-op for instance norm, which is stateless
# in the reference's affine=False configuration).
_EVAL_MODE: bool = False


class eval_mode:
    """Context manager: trace batch-norm layers in eval (running-stats) mode."""

    def __enter__(self):
        global _EVAL_MODE
        self._prev = _EVAL_MODE
        _EVAL_MODE = True
        return self

    def __exit__(self, *exc):
        global _EVAL_MODE
        _EVAL_MODE = self._prev
        return False


class collect_batch_stats:
    """Context manager installing a trace-time batch-stats collector."""

    def __init__(self):
        self.stats = []

    def __enter__(self):
        global _STATS_COLLECTOR
        self._prev = _STATS_COLLECTOR
        _STATS_COLLECTOR = self.stats
        return self.stats

    def __exit__(self, *exc):
        global _STATS_COLLECTOR
        _STATS_COLLECTOR = self._prev
        return False


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
        # (models/networks.py:114-116); running stats at the torch defaults
        return {
            "scale": 1.0 + jax.random.normal(key, (nc,)) * init_gain,
            "offset": jnp.zeros((nc,)),
            "running_mean": jnp.zeros((nc,)),
            "running_var": jnp.ones((nc,)),
        }

    def apply(self, params: Params, x: jnp.ndarray,
              train: bool = True) -> jnp.ndarray:
        if self.kind == "instance":
            return InstanceNorm(self.dim).apply(x)
        if self.kind == "batch":
            xf = x.astype(jnp.float32)
            if (train and not _EVAL_MODE) or "running_mean" not in params:
                axes = tuple(range(0, 1 + self.dim))  # over batch + spatial
                mean = jnp.mean(xf, axis=axes, keepdims=True)
                var = jnp.mean(jnp.square(xf - mean), axis=axes, keepdims=True)
                if _STATS_COLLECTOR is not None:
                    _STATS_COLLECTOR.append(
                        (params, jnp.squeeze(mean), jnp.squeeze(var)))
            else:
                shape = (1,) * (1 + self.dim) + (-1,)
                mean = params["running_mean"].reshape(shape)
                var = params["running_var"].reshape(shape)
            y = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
            y = y * params["scale"] + params["offset"]
            return y.astype(x.dtype)
        return x


def ema_update_stats(stats, momentum: float = 0.1):
    """For each collected (params, mean, var): new buffers via the torch EMA
    ``running = (1 - momentum) * running + momentum * batch``.  Returns a list
    of updated (running_mean, running_var) pairs in collection order."""
    out = []
    for params, mean, var in stats:
        rm = (1 - momentum) * params["running_mean"] + momentum * mean
        rv = (1 - momentum) * params["running_var"] + momentum * var
        out.append((rm, rv))
    return out


def get_norm_spec(norm_type: str, dim: int) -> NormSpec:
    if norm_type == "batch":
        return NormSpec("batch", dim)
    if norm_type == "instance":
        return NormSpec("instance", dim)
    if norm_type in ("spectral", "none"):
        return NormSpec("none", dim)
    raise NotImplementedError(f"normalization layer [{norm_type}] is not found")
