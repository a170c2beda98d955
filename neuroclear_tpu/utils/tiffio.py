"""Minimal 3D TIFF I/O built on PIL (tifffile is not in this image).

Reads/writes multi-page grayscale TIFF volumes (uint8/uint16/float32) —
covers the reference's usage of skimage.io.imread / tifffile.imsave on
microscopy stacks (singlevolume_dataset.py:33, test_dice.py:151).
Also supports .npy volumes (the reference's make_dataset lists them).
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image, ImageSequence

Image.MAX_IMAGE_PIXELS = None  # large microscopy slices


def imread(path: str) -> np.ndarray:
    """Load a 2D image or 3D (Z,Y,X) stack."""
    if path.endswith(".npy"):
        return np.load(path)
    with Image.open(path) as im:
        pages = [np.asarray(p) for p in ImageSequence.Iterator(im)]
    if len(pages) == 1:
        return pages[0]
    return np.stack(pages, axis=0)


def imwrite(path: str, arr: np.ndarray) -> None:
    """Save a 2D image or a 3D (Z,Y,X) stack as (multi-page) TIFF."""
    arr = np.asarray(arr)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if path.endswith(".npy"):
        np.save(path, arr)
        return
    if arr.ndim == 2:
        _page(arr).save(path)
        return
    pages = [_page(sl) for sl in arr]
    pages[0].save(path, save_all=True, append_images=pages[1:])


def _page(sl: np.ndarray) -> Image.Image:
    if sl.dtype == np.uint16:
        return Image.fromarray(sl, mode="I;16")
    if sl.dtype in (np.float32, np.float64):
        return Image.fromarray(sl.astype(np.float32), mode="F")
    return Image.fromarray(sl)
