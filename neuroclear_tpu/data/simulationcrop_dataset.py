"""DiceImage variant that crops a fixed 700^3 region before dicing
(reference: data/simulationcrop_dataset.py:38-42, hard-coded offsets)."""

from __future__ import annotations

import numpy as np

from .diceImage_dataset import DiceImageDataSet
from ..utils import tiffio


class SimulationCropDataSet(DiceImageDataSet):
    CROP_OFFSET = (136, 104, 120)  # z, y, x (reference :38-40)
    CROP_SIZE = 700

    def _load(self) -> np.ndarray:
        vol = tiffio.imread(self.A_path)
        z, y, x = self.CROP_OFFSET
        s = self.CROP_SIZE
        return np.ascontiguousarray(vol[z:z + s, y:y + s, x:x + s])
