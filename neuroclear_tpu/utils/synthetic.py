"""Synthetic bead-volume generator for the simulation study.

Re-creates the capability of the reference's missing notebook
``jupyter_notebook/Data Generator for Simulation.ipynb`` (listed in
.MISSING_LARGE_BLOBS; described in README.md:112-116): a randomized bead
volume with (a) a sharp isotropic ground truth, (b) an axially blurred +
noisy input (the network's training data), and (c) a 90-degree rotated copy.

Beads are Gaussian blobs of random intensity/size; the axial degradation is
a separable Gaussian PSF elongated along Z plus Gaussian + Poisson noise —
the standard fluorescence-microscopy simulation model used by the paper.
"""

from __future__ import annotations

import numpy as np


def generate_bead_volume(
    shape=(300, 300, 300),
    n_beads: int = 1200,
    bead_sigma_range=(1.0, 3.0),
    intensity_range=(0.3, 1.0),
    axial_sigma: float = 6.0,
    lateral_sigma: float = 1.0,
    gauss_noise: float = 0.01,
    poisson_peak: float = 200.0,
    seed: int = 0,
    dtype=np.uint16,
):
    """Return (input_blurred, ground_truth, rotated_gt) uint16 volumes.

    input = GT convolved with an anisotropic Gaussian PSF (sigma_z =
    axial_sigma, sigma_xy = lateral_sigma) + Poisson shot noise + Gaussian
    read noise; rotated_gt is the GT rotated 90 degrees about the X axis
    (so its sharp plane becomes axial) — the evaluation aid the notebook
    produced.
    """
    rng = np.random.default_rng(seed)
    z, y, x = shape
    gt = np.zeros(shape, np.float32)

    # splat Gaussian beads on a padded canvas
    pad = 8
    canvas = np.zeros((z + 2 * pad, y + 2 * pad, x + 2 * pad), np.float32)
    for _ in range(n_beads):
        cz = rng.uniform(pad, z + pad)
        cy = rng.uniform(pad, y + pad)
        cx = rng.uniform(pad, x + pad)
        s = rng.uniform(*bead_sigma_range)
        amp = rng.uniform(*intensity_range)
        r = int(np.ceil(3 * s))
        zz = np.arange(int(cz) - r, int(cz) + r + 1)
        yy = np.arange(int(cy) - r, int(cy) + r + 1)
        xx = np.arange(int(cx) - r, int(cx) + r + 1)
        zz = zz[(zz >= 0) & (zz < canvas.shape[0])]
        yy = yy[(yy >= 0) & (yy < canvas.shape[1])]
        xx = xx[(xx >= 0) & (xx < canvas.shape[2])]
        gz = np.exp(-((zz - cz) ** 2) / (2 * s * s))
        gy = np.exp(-((yy - cy) ** 2) / (2 * s * s))
        gx = np.exp(-((xx - cx) ** 2) / (2 * s * s))
        canvas[np.ix_(zz, yy, xx)] += amp * gz[:, None, None] * gy[None, :, None] * gx[None, None, :]
    gt = canvas[pad:-pad, pad:-pad, pad:-pad]
    gt = np.clip(gt, 0.0, 1.0)

    blurred = _gaussian_blur_separable(gt, (axial_sigma, lateral_sigma, lateral_sigma))
    noisy = rng.poisson(np.clip(blurred, 0, None) * poisson_peak) / poisson_peak
    noisy = noisy + rng.normal(0.0, gauss_noise, noisy.shape)
    noisy = np.clip(noisy, 0.0, 1.0)

    rotated = np.rot90(gt, k=1, axes=(0, 1))  # sharp plane becomes axial

    scale = np.iinfo(dtype).max if np.issubdtype(dtype, np.integer) else 1.0
    conv = lambda v: (v * scale).astype(dtype)
    return conv(noisy), conv(gt), conv(np.ascontiguousarray(rotated))


def _gaussian_blur_separable(vol: np.ndarray, sigmas) -> np.ndarray:
    """Separable Gaussian blur (scipy's 1D filter per axis)."""
    from scipy.ndimage import gaussian_filter1d

    out = vol
    for ax, s in enumerate(sigmas):
        if s > 0:
            out = gaussian_filter1d(out, s, axis=ax, mode="constant")
    return out
