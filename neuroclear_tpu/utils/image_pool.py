"""Classic CycleGAN 50%-swap fake-image history buffer
(parity target: /root/reference/util/image_pool.py — imported by Athena but
never called there; provided for API completeness)."""

from __future__ import annotations

import random

import numpy as np


class ImagePool:
    def __init__(self, pool_size: int):
        self.pool_size = pool_size
        if self.pool_size > 0:
            self.num_imgs = 0
            self.images = []

    def query(self, images):
        if self.pool_size == 0:
            return images
        return_images = []
        for image in np.asarray(images):
            image = image[None]
            if self.num_imgs < self.pool_size:
                self.num_imgs += 1
                self.images.append(image)
                return_images.append(image)
            else:
                if random.uniform(0, 1) > 0.5:
                    random_id = random.randint(0, self.pool_size - 1)
                    tmp = self.images[random_id].copy()
                    self.images[random_id] = image
                    return_images.append(tmp)
                else:
                    return_images.append(image)
        return np.concatenate(return_images, 0)
