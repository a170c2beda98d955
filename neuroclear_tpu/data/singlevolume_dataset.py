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

    # --- host parity path -----------------------------------------------------

    def __getitem__(self, index):
        A = self.transform_A(self.A_img_np)
        return {"A": A, "A_paths": self.A_path}

    def __len__(self):
        return int(10)  # each epoch is 10 images (reference :47-55)
