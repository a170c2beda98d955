"""Device mesh management.

The reference's only parallelism was single-process torch DataParallel
(models/networks.py:132-135).  The TPU-native replacement is a
``jax.sharding.Mesh`` with a ``data`` axis: parameters replicated, the cube
batch (training crops or inference tiles) sharded, gradients reduced with
``psum`` over ICI.  A ``model`` axis is reserved for future tensor-parallel
experiments (not needed at these model sizes, SURVEY §2.3).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def device_count() -> int:
    return len(jax.devices())


def get_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))
