"""Data-parallel training over a Mesh('data').

The reference's only scale-out was single-process torch DataParallel
(models/networks.py:132-135).  Here: parameters + optimizer state are
replicated, the crop batch is sharded over the 'data' axis, and the fused
train step compiles into an SPMD program where XLA inserts the gradient
all-reduces over ICI — no explicit collectives in model code (losses are
means over the batch, so psum falls out of the partitioner).

Usage (train_onecube does this automatically when >1 device is visible):

    dp = DataParallel(model)           # wraps a BaseModel subclass
    batch = dp.stack([sample() for _ in range(dp.n)])   # (n_dev, z, y, x, 1)
    model.set_input({"A": dp.shard(batch)})
    model.optimize_parameters()
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import get_mesh


def maybe_initialize_distributed() -> None:
    """Multi-host (DCN) bring-up: call jax.distributed.initialize when the
    standard coordinator env vars are present.  Single-host slices (the
    v5p-8 target) don't need this; multi-slice pods do."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


class DataParallel:
    def __init__(self, model, n_devices: int | None = None):
        self.model = model
        self.mesh = get_mesh(n_devices)
        self.n = self.mesh.devices.size
        repl = NamedSharding(self.mesh, P())
        self.batched = NamedSharding(self.mesh, P("data"))
        model.params = jax.device_put(model.params, repl)
        if hasattr(model, "opt_state"):
            model.opt_state = jax.device_put(model.opt_state, repl)

    def stack(self, crops) -> np.ndarray:
        """List of (1, z, y, x, 1) crops -> one (n, z, y, x, 1) batch."""
        import jax.numpy as jnp

        return jnp.concatenate([jnp.asarray(c) for c in crops], axis=0)

    def shard(self, batch):
        return jax.device_put(batch, self.batched)

    def batch_sampler(self, dataset):
        """rng -> (n_dev, cz, cy, cx, 1) batch, emitted device-sharded.

        One compiled program vmaps the fused augmentation over per-device
        PRNG keys; with the output sharded over 'data' each device gathers
        only its own crop from its replicated volume copy.  This replaces
        the per-device host loop (n sequential device round-trips + a
        reshard per iteration) that throttled multi-chip sampling.
        """
        import functools

        from ..ops.augment import augment_core

        cfg = dataset.device_sampling_config()
        vol = jax.device_put(np.asarray(dataset.A_img_np),
                             NamedSharding(self.mesh, P()))
        n = self.n

        @functools.partial(jax.jit, out_shardings=self.batched)
        def _sample(rng, v):
            keys = jax.random.split(rng, n)
            out = jax.vmap(lambda k: augment_core(k, v, **cfg))(keys)
            return out[..., None]

        return lambda rng: _sample(rng, vol)
