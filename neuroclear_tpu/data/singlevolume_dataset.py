"""Training dataset: ONE volume in memory, each item is a fresh random
augmentation of it (reference: data/singlevolume_dataset.py:20-55).

TPU-native fast path: the raw volume is uploaded to HBM once and
``sample(rng)`` draws an augmented crop entirely on device
(ops/augment.fused_augment) — replacing the reference's per-iteration host
cv2 chain.  ``__getitem__`` keeps the host chain for API parity and for
preprocess combos the device path doesn't cover.
"""

from __future__ import annotations

import numpy as np

from .base_dataset import BaseDataset, get_transform
from .image_folder import make_dataset
from ..utils import tiffio

_DEVICE_TOKENS = {"random3Drotate", "random90rotate", "randomcrop", "randomflip",
                  "addColorChannel", "addBatchChannel"}


class SingleVolumeDataset(BaseDataset):
    def __init__(self, opt):
        BaseDataset.__init__(self, opt)
        self.A_path = make_dataset(opt.dataroot, 1)[0]
        self.A_img_np = tiffio.imread(self.A_path)
        self.transform_A = get_transform(self.opt)
        self.isTrain = opt.isTrain

        tokens = [t for t in opt.preprocess.split("_") if t and t != "none"]
        self._device_ok = (
            set(tokens) <= _DEVICE_TOKENS
            and not ("random3Drotate" in tokens and "random90rotate" in tokens)
            and "randomcrop" in tokens
            and all(c > 0 for c in opt.crop_size)
        )
        if self._device_ok and "random3Drotate" in tokens:
            # worst-case inscribed rectangle (45 deg) must still fit the crop
            # — the host chain would hit the reference's crop assert
            # (base_dataset.py:191-193); fail the same way, up front.
            z, y, x = self.A_img_np.shape
            worst = int(min(y, x) / np.sqrt(2.0))
            cz, cy, cx = opt.crop_size
            assert z >= cz and worst >= cy and worst >= cx, (
                f"crop {opt.crop_size} cannot fit the worst-case rotated "
                f"volume extents ({z},{worst},{worst})")
        self._tokens = set(tokens)
        self._vol_dev = None

    # --- device fast path ---------------------------------------------------

    def device_volume(self):
        import jax

        if self._vol_dev is None:
            self._vol_dev = jax.device_put(self.A_img_np)
        return self._vol_dev

    @property
    def supports_device_sampling(self) -> bool:
        return self._device_ok

    def device_sampling_config(self) -> dict:
        """Static kwargs for ops.augment.augment_core on this dataset."""
        from ..ops.augment import dtype_inv_scale

        return dict(
            crop_size=tuple(self.opt.crop_size),
            inv_scale=dtype_inv_scale(self.A_img_np.dtype),
            do_rotate="random3Drotate" in self._tokens,
            do_rot90="random90rotate" in self._tokens,
            do_flip="randomflip" in self._tokens,
        )

    def sample(self, rng):
        """Augmented crop on device -> (1, cz, cy, cx, 1) float32."""
        from ..ops.augment import dtype_inv_scale, fused_augment

        vol = self.device_volume()
        out = fused_augment(
            rng, vol, tuple(self.opt.crop_size),
            dtype_inv_scale(self.A_img_np.dtype),
            do_rotate="random3Drotate" in self._tokens,
            do_rot90="random90rotate" in self._tokens,
            do_flip="randomflip" in self._tokens,
        )
        return out[None, ..., None]

    def sample_batch(self, rng, n: int):
        """n augmented crops in ONE compiled program -> (n, cz, cy, cx, 1).

        Mirrors parallel.train_parallel.DataParallel.batch_sampler (vmap of
        the fused chain over per-crop PRNG keys) without the mesh sharding —
        feeds the single-chip --grad_accum path."""
        import jax

        if getattr(self, "_batch_sample", None) is None \
                or self._batch_sample_n != n:
            from ..ops.augment import augment_core

            cfg = self.device_sampling_config()

            @jax.jit
            def _sample(rng, v):
                keys = jax.random.split(rng, n)
                return jax.vmap(lambda k: augment_core(k, v, **cfg))(keys)

            self._batch_sample, self._batch_sample_n = _sample, n
        return self._batch_sample(rng, self.device_volume())[..., None]

    def per_crop_sampler(self, rng, n: int):
        """f(i) -> crop i of the batch-n recipe, one crop on device at a
        time (same per-crop PRNG key split as sample_batch / the mesh DP
        sampler, run through the SINGLE-crop program like the DP sampler).

        Feeds the host-microbatch --grad_accum path: the (n, cz, cy, cx, 1)
        batch is never materialised in HBM — at the 8x148^3/700^3 production
        point that batch (103 MB) plus the accumulators sat on top of a step
        that fits the 16 GB v5e with only tens of MB to spare."""
        import jax

        keys = jax.random.split(rng, n)
        return lambda i: self.sample(keys[i])

    def per_crop_host_window_sampler(self, rng, n: int):
        """per_crop_sampler semantics WITHOUT the HBM-resident volume: the
        PRNG/geometry plan runs on the host CPU backend (same threefry
        bits) and only each crop's ~(cz, diag, diag) gather window is
        uploaded (ops/augment.host_window_sample).  This is what lets the
        accum-8 step fit the 16 GB v5e: the 686 MB resident volume was the
        final RESOURCE_EXHAUSTED margin (docs/QUALITY.md round 5)."""
        import jax

        from ..ops.augment import host_window_plan, host_window_sample

        keys = jax.random.split(rng, n)
        cfg = self.device_sampling_config()
        kw = dict(do_rotate=cfg["do_rotate"], do_rot90=cfg["do_rot90"],
                  do_flip=cfg["do_flip"])
        # ONE tiny device program + ONE host pull plans all n crops
        draws = host_window_plan(keys, self.A_img_np.shape,
                                 cfg["crop_size"], **kw)

        def f(i):
            out = host_window_sample(draws[i], self.A_img_np,
                                     cfg["crop_size"], cfg["inv_scale"], **kw)
            return out[None, ..., None]

        return f

    def sample_host_window(self, rng):
        """sample() semantics without the HBM-resident volume: the crop's
        PRNG draws are planned from `rng` (same key, same threefry bits as
        sample) and only the gather window is uploaded.  For HBM-critical
        accum-1 runs (NEUROCLEAR_HOST_WINDOW=1 in train_onecube) — e.g.
        athena at 144^3, whose step fits the v5e only without the volume."""
        from ..ops.augment import host_window_sample

        cfg = self.device_sampling_config()
        out = host_window_sample(np.asarray(rng), self.A_img_np,
                                 cfg["crop_size"], cfg["inv_scale"],
                                 do_rotate=cfg["do_rotate"],
                                 do_rot90=cfg["do_rot90"],
                                 do_flip=cfg["do_flip"])
        return out[None, ..., None]

    # --- host parity path -----------------------------------------------------

    def __getitem__(self, index):
        A = self.transform_A(self.A_img_np)
        return {"A": A, "A_paths": self.A_path}

    def __len__(self):
        return int(10)  # each epoch is 10 images (reference :47-55)
