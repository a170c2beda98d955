"""Volume-file discovery (reference: data/image_folder.py:17-43)."""

from __future__ import annotations

import os

IMG_EXTENSIONS = [
    ".jpg", ".JPG", ".jpeg", ".JPEG", ".npy",
    ".png", ".PNG", ".ppm", ".PPM", ".bmp", ".BMP",
    ".tif", ".TIF", ".tiff", ".TIFF",
]


def is_image_file(filename: str) -> bool:
    return any(filename.endswith(ext) for ext in IMG_EXTENSIONS)


def make_dataset(directory: str, max_dataset_size=float("inf")):
    images = []
    assert os.path.isdir(directory), f"{directory} is not a valid directory"
    for root, _, fnames in sorted(os.walk(directory)):
        for fname in sorted(fnames):
            if is_image_file(fname) and not fname.startswith("."):
                images.append(os.path.join(root, fname))
    return images[: min(max_dataset_size, len(images))]


def merge_datasets(*roots, max_dataset_size=float("inf")):
    images = []
    for r in roots:
        images += make_dataset(r, max_dataset_size)
    return images
