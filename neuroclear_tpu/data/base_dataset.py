"""BaseDataset + the host-side transform/augmentation chain.

This is the semantics-parity twin of /root/reference/data/base_dataset.py:
the same preprocess tokens compose in the same order
(random3Drotate -> random90rotate -> randomcrop -> centercrop -> normalize ->
randomflip -> addColorChannel -> reorderColorChannel -> addBatchChannel),
with numpy outputs.  Training normally uses the fused on-device chain
(ops/augment.py); this host chain is the reference implementation for parity
tests and the fallback for preprocess combos the device path doesn't cover.

Channel convention: the reference emits torch NCDHW; we emit channels-last
(addColorChannel appends the axis, addBatchChannel prepends), matching the
NDHWC network layout.
"""

from __future__ import annotations

import math
import random
from abc import ABC, abstractmethod

import numpy as np

from ..ops.rotation import rotation_geometry


class BaseDataset(ABC):
    def __init__(self, opt):
        self.opt = opt
        self.root = opt.dataroot

    @staticmethod
    def modify_commandline_options(parser, is_train):
        return parser

    @abstractmethod
    def __len__(self):
        return 0

    @abstractmethod
    def __getitem__(self, index):
        pass


def get_params(opt, vol_shape):
    """Pre-sampled transform params (base_dataset.py:70-85)."""
    crop_z, crop_y, crop_x = opt.crop_size
    z = random.randint(0, max(0, vol_shape[0] - crop_z))
    y = random.randint(0, max(0, vol_shape[1] - crop_y))
    x = random.randint(0, max(0, vol_shape[2] - crop_x))
    return {
        "crop_pos": (z, y, x),
        "flip_axis": np.random.randint(0, 3),
        "angle_3D": random.randint(0, 359),
    }


def get_transform(opt, params=None):
    """Compose the host chain for opt.preprocess; returns fn(np) -> np."""
    steps = []
    pp = opt.preprocess

    if "random3Drotate" in pp:
        if params is None:
            steps.append(lambda v: rotate_clean_3d_xy(v, random.randint(0, 359)))
        else:
            steps.append(lambda v: rotate_clean_3d_xy(v, params["angle_3D"]))
    if "random90rotate" in pp:
        steps.append(lambda v: rotate_clean_3d_xy(
            v, int(np.random.choice((-90, 90, -180, 180, -270, 270)))))
    if "randomcrop" in pp:
        if params is None:
            steps.append(lambda v: random_crop(v, opt.crop_size))
        else:
            steps.append(lambda v: crop_at(v, params["crop_pos"], opt.crop_size))
    if "centercrop" in pp:
        steps.append(lambda v: center_crop(v, opt.crop_portion))

    steps.append(normalize_dtype)

    if "randomflip" in pp:
        if params is None:
            steps.append(random_flip)
        else:
            steps.append(lambda v: np.flip(v, params["flip_axis"]))
    if "addColorChannel" in pp:
        steps.append(lambda v: np.expand_dims(v, axis=-1))  # channels-last
    if "reorderColorChannel" in pp:
        # (y, x, c) -> (c, y, x) in the reference; we keep channels-last, so
        # (c, y, x) -> (y, x, c)
        steps.append(lambda v: np.moveaxis(v, 0, -1))
    if "addBatchChannel" in pp:
        steps.append(lambda v: np.expand_dims(v, axis=0))

    steps.append(lambda v: np.ascontiguousarray(v, dtype=np.float32))

    def compose(v):
        for s in steps:
            v = s(v)
        return v

    return compose


# --- individual transforms ---------------------------------------------------


def normalize_dtype(img: np.ndarray) -> np.ndarray:
    """uint8 -> /255, uint16 -> /65535 (base_dataset.py:134-143); floats pass
    through unchanged (the reference raises NameError on floats — fixed)."""
    if img.dtype == np.uint8:
        return (img / (2 ** 8 * 1.0 - 1)).astype(float)
    if img.dtype == np.uint16:
        return (img / (2 ** 16 * 1.0 - 1)).astype(float)
    return img


def random_crop(img: np.ndarray, crop_size) -> np.ndarray:
    """3D/2D random crop; crop extent 0 means 'keep the full axis'
    (base_dataset.py:187-240)."""
    if img.ndim > 2:
        crop = list(crop_size)
        offs, ends = [], []
        for ax in range(3):
            c = crop[ax]
            assert img.shape[ax] - c >= 0
            o = random.randint(0, img.shape[ax] - c)
            if c == 0:
                offs.append(0)
                ends.append(None)
            else:
                offs.append(o)
                ends.append(o + c)
        return img[offs[0]:ends[0], offs[1]:ends[1], offs[2]:ends[2]]
    crop_y, crop_x = crop_size[:2]
    y = random.randint(0, img.shape[0] - crop_y)
    x = random.randint(0, img.shape[1] - crop_x)
    ye = None if crop_y == 0 else y + crop_y
    xe = None if crop_x == 0 else x + crop_x
    if crop_y == 0:
        y = 0
    if crop_x == 0:
        x = 0
    return img[y:ye, x:xe]


def crop_at(img: np.ndarray, pos, crop_size) -> np.ndarray:
    z, y, x = pos
    cz, cy, cx = crop_size
    return img[z:z + cz, y:y + cy, x:x + cx]


def center_crop(img: np.ndarray, crop_portion: int) -> np.ndarray:
    """Keep crop_portion percent around the centre (base_dataset.py:249-262)."""
    frac = (100 - crop_portion * 1.0) / 100
    if img.ndim > 2:
        z, y, x = img.shape
        cz, cy, cx = int(z * frac / 2), int(y * frac / 2), int(x * frac / 2)
        return img[cz:-cz, cy:-cy, cx:-cx]
    y, x = img.shape
    cy, cx = int(y * frac / 2), int(x * frac / 2)
    return img[cy:-cy, cx:-cx]


def permutate(img: np.ndarray) -> np.ndarray:
    """Stack the volume with each single-axis flip (base_dataset.py:159-170)."""
    flips = [img] + [np.flip(img, ax) for ax in range(img.ndim)]
    return np.stack(flips, axis=0)


def random_contrast(img: np.ndarray, randomcontrast_val: int = 50) -> np.ndarray:
    """Random contrast stretch by percentile clipping (base_dataset.py:172-185)."""
    pct = random.randint(randomcontrast_val, 99)
    lo, hi = np.min(img), np.max(img)
    top = np.percentile(img, pct)
    if hi == top:
        return img
    clipped = np.clip(img, top, None)
    return (clipped - top) * ((hi - lo) / (hi - top)) + lo


def random_gamma(img: np.ndarray) -> np.ndarray:
    """Random gamma in [1, 1.5] on a [0,1] image (base_dataset.py:274-277)."""
    gamma = np.random.uniform(1.0, 1.5)
    return img ** (1.0 / gamma)


def random_flip(img: np.ndarray) -> np.ndarray:
    """Each axis flipped with probability 1/2 (distribution-equal to the
    reference's shuffled-pop scheme, base_dataset.py:279-289)."""
    for ax in range(img.ndim):
        if np.random.uniform(0, 1) < 0.5:
            img = np.flip(img, ax)
    return img


def rotate_clean(image: np.ndarray, angle) -> np.ndarray:
    """Rotate one 2D slice about its centre and crop to the largest inscribed
    rectangle — cv2-exact twin of base_dataset.py:306-443 (single warpAffine
    with the composed matrix, then the integer centre-crop)."""
    import cv2

    h, w = image.shape
    g = rotation_geometry(float(w), float(h), float(angle), xp=math)
    m = np.array([[g.fwd[0], g.fwd[1], g.fwd[2]],
                  [g.fwd[3], g.fwd[4], g.fwd[5]]], dtype=np.float64)
    canvas = cv2.warpAffine(image, m, (int(g.new_w), int(g.new_h)),
                            flags=cv2.INTER_LINEAR)
    return canvas[g.y1:g.y1 + g.crop_h, g.x1:g.x1 + g.crop_w]


def rotate_clean_3d_xy(vol: np.ndarray, angle) -> np.ndarray:
    return np.array([rotate_clean(sl, angle) for sl in vol])
