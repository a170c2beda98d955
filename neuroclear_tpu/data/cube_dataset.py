"""Multi-file training dataset: numerically sorted list of volumes, one
augmented volume per index (reference: data/cube_dataset.py:15-67)."""

from __future__ import annotations

import re

from .base_dataset import BaseDataset, get_transform
from .image_folder import make_dataset
from ..utils import tiffio


def numericalSort(value):
    numbers = re.compile(r"(\d+)")
    parts = numbers.split(value)
    parts[1::2] = map(int, parts[1::2])
    return parts


class CubeDataset(BaseDataset):
    def __init__(self, opt):
        BaseDataset.__init__(self, opt)
        self.A_paths = make_dataset(opt.dataroot)
        self.A_paths.sort(key=numericalSort)
        self.A_size = len(self.A_paths)
        self.transform_A = get_transform(self.opt)
        self.isTrain = opt.isTrain

    def __getitem__(self, index):
        A_path = self.A_paths[index % self.A_size]
        A_img_np = tiffio.imread(A_path)
        return {"A": self.transform_A(A_img_np), "A_paths": A_path}

    def __len__(self):
        return self.A_size
