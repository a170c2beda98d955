"""Inference dataset: one volume, diced into overlapping cubes
(reference: data/diceImage_dataset.py:9-124)."""

from __future__ import annotations

import numpy as np

from .base_dataset import BaseDataset, get_transform
from .dicing import DiceCube
from .image_folder import make_dataset
from ..utils import tiffio
from ..utils.imageops import pad_for_dicing


class DiceImageDataSet(BaseDataset):
    @staticmethod
    def modify_commandline_options(parser, is_train=False):
        parser.add_argument("--overlap", type=int, default=0,
                            help="set the size of overlapping region when dicing the dataset.")
        parser.add_argument("--border_cut", default=0, type=int,
                            help="specify how much border you want to remove in a cube-by-cube inference.")
        return parser

    def __init__(self, opt):
        BaseDataset.__init__(self, opt)
        self.A_path = make_dataset(opt.dataroot, 1)[0]
        self.roi_size = opt.dice_size[0]
        self.overlap = opt.overlap
        self.border_cut = opt.border_cut

        A_img_np = self._load()
        self.transform = get_transform(opt)
        self.image_size_original = A_img_np.shape
        A_img_np = pad_for_dicing(A_img_np, self.roi_size, overlap=self.overlap)
        self.image_size = A_img_np.shape
        self.cube = DiceCube(A_img_np, self.roi_size, overlap=self.overlap,
                             border_cut=self.border_cut)

    def _load(self) -> np.ndarray:
        return tiffio.imread(self.A_path)

    def __getitem__(self, index):
        cube = self.cube[index]
        return {"A": self.transform(cube), "A_paths": str(index)}

    def __len__(self):
        return len(self.cube)

    def shape(self):
        return (self.cube.z_steps, self.cube.y_steps, self.cube.x_steps)

    def size(self):
        return self.image_size

    def size_original(self):
        return self.image_size_original
