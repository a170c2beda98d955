"""Host-side image helpers: dtype conversion, normalisation, histogram ops,
metrics.  Parity targets: util/util.py (tensor2im, normalize, standardize,
noisy, get_psnr/get_snr/get_mse, pad/crop_for_dicing) and the skimage calls
used by Assemble_Dice (match_histograms, rescale_intensity) — skimage is not
in this image, so those are implemented here.
"""

from __future__ import annotations

import math
import os

import numpy as np


# --- dtype conversion (util/util.py:11-39) ---------------------------------


def tensor2im(x, imtype=np.uint16) -> np.ndarray:
    """Array in [0,1] -> clipped integer image (jax/np arrays accepted)."""
    img = np.asarray(x, dtype=np.float32)
    if imtype == np.uint8:
        img = np.clip(img, 0, 1) * (2 ** 8 - 1.0)
        img = np.clip(img, 0, 255)
    elif imtype == np.uint16:
        img = np.clip(img, 0, 1) * (2 ** 16 - 1.0)
        img = np.clip(img, 0, 2 ** 16 - 1)
    return img.astype(imtype)


def normalize(img: np.ndarray, data_type=float) -> np.ndarray:
    """Min-max rescale to the full range of data_type (util/util.py:57-72)."""
    lo, hi = np.min(img), np.max(img)
    if data_type == np.uint8:
        new_max = 2 ** 8 - 1
    elif data_type == np.uint16:
        new_max = 2 ** 16 - 1
    else:
        new_max = 1
    out = (img - lo) * (new_max / (hi - lo))
    return out.astype(data_type)


def standardize(img: np.ndarray) -> np.ndarray:
    return (img - np.mean(img)) / np.std(img)


def noisy(noise_typ: str, image: np.ndarray, sigma=0.1, peak=0.1,
          is_normalize=True, rng: np.random.Generator | None = None) -> np.ndarray:
    """Gaussian / Poisson noise injection (util/util.py:74-99)."""
    rng = rng or np.random.default_rng()
    if noise_typ == "gauss":
        out = image + rng.normal(0.0, sigma, image.shape)
    elif noise_typ == "poisson":
        out = rng.poisson(image * peak) / float(peak)
    else:
        raise ValueError(noise_typ)
    if is_normalize:
        out = normalize(out)
    return out


# --- metrics (util/util.py:101-119) -----------------------------------------


def get_mse(source, target):
    return np.mean((np.asarray(target, float) - np.asarray(source, float)) ** 2)


def get_snr(img_original, img_noised):
    mse = np.mean((img_original - img_noised) ** 2)
    ps = np.mean(np.asarray(img_original, float) ** 2)
    return 10 * math.log10(ps / mse)


def get_psnr(source, target, data_range):
    mse = get_mse(source, target)
    return 20 * math.log10(data_range) - 10 * math.log10(mse)


def _ssim_map_sum(a, b, data_range, win):
    """Sum and count of the local-window SSIM map over one (sub)volume."""
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2

    def box(x):
        for ax in range(x.ndim):
            c = np.cumsum(x, axis=ax)
            lead = np.take(c, range(win - 1, x.shape[ax]), axis=ax)
            lag = np.concatenate(
                [np.zeros_like(np.take(c, [0], axis=ax)),
                 np.take(c, range(0, x.shape[ax] - win), axis=ax)], axis=ax)
            x = (lead - lag) / win
        return x

    mu_a, mu_b = box(a), box(b)
    saa = box(a * a) - mu_a ** 2
    sbb = box(b * b) - mu_b ** 2
    sab = box(a * b) - mu_a * mu_b
    ssim_map = ((2 * mu_a * mu_b + c1) * (2 * sab + c2)) / (
        (mu_a ** 2 + mu_b ** 2 + c1) * (saa + sbb + c2))
    return float(np.sum(ssim_map)), ssim_map.size


def get_ssim(a, b, data_range, win: int = 7, chunk_voxels: int = 48_000_000):
    """Mean local-window SSIM (scaffolding parity with the unused skimage
    call in util/visualizer.py:59-83).  Uniform filter via cumulative sums
    (no scipy needed).  Large volumes are processed in leading-axis chunks
    with a (win-1)-row halo — exact (each chunk computes a disjoint strip of
    the same valid-window map), so 700^3+ evals run in bounded memory
    (~10 float64 copies of one chunk, not of the volume)."""
    a = np.asarray(a)
    b = np.asarray(b)
    if a.ndim < 1 or a.shape[0] < win or a.size <= chunk_voxels:
        return _chunk_mean([(np.asarray(a, np.float64),
                             np.asarray(b, np.float64))], data_range, win)
    rows_per = max(win, chunk_voxels // max(1, int(np.prod(a.shape[1:]))))
    n_valid = a.shape[0] - win + 1  # valid window starts along axis 0
    pairs = []
    for z0 in range(0, n_valid, rows_per):
        z1 = min(z0 + rows_per, n_valid)  # windows [z0, z1) -> rows up to
        pairs.append((np.asarray(a[z0:z1 + win - 1], np.float64),
                      np.asarray(b[z0:z1 + win - 1], np.float64)))
    return _chunk_mean(pairs, data_range, win)


def _chunk_mean(pairs, data_range, win):
    total, count = 0.0, 0
    for ca, cb in pairs:
        s, n = _ssim_map_sum(ca, cb, data_range, win)
        total += s
        count += n
    return total / max(count, 1)


# --- histogram ops (skimage.exposure equivalents) ---------------------------


def rescale_intensity(img: np.ndarray, in_range: tuple) -> np.ndarray:
    """skimage.exposure.rescale_intensity(float image, in_range=(lo,hi)) ->
    clip + scale to [0,1] (used by Assemble_Dice --normalize_intensity,
    util/assemble_dice.py:190-192)."""
    lo, hi = in_range
    img = np.clip(img, lo, hi)
    return (img - lo) / max(hi - lo, np.finfo(np.float32).tiny)


def match_histograms(image: np.ndarray, reference: np.ndarray) -> np.ndarray:
    """skimage.exposure.match_histograms for single-channel arrays: map the
    image's empirical CDF onto the reference's (Assemble_Dice
    --histogram_match, util/assemble_dice.py:150-151)."""
    src = image.ravel()
    ref = reference.ravel()
    src_vals, src_inv, src_cnt = np.unique(src, return_inverse=True, return_counts=True)
    ref_vals, ref_cnt = np.unique(ref, return_counts=True)
    src_q = np.cumsum(src_cnt) / src.size
    ref_q = np.cumsum(ref_cnt) / ref.size
    mapped = np.interp(src_q, ref_q, ref_vals)
    return mapped[src_inv].reshape(image.shape).astype(image.dtype, copy=False)


# --- dicing pads (util/util.py:196-237) -------------------------------------


def pad_for_dicing(image: np.ndarray, roi_size: int, overlap: int = 0) -> np.ndarray:
    """End-pad (zeros) so stride (roi-overlap) tiles the volume exactly."""
    step = roi_size - overlap
    pads = []
    for dim in image.shape[::-1]:
        counts = (dim + overlap) // step
        pads.append(step * counts + roi_size - dim)
    z_pad, y_pad, x_pad = pads[2], pads[1], pads[0]
    return np.pad(image, ((0, z_pad), (0, y_pad), (0, x_pad)))


def crop_for_dicing(image: np.ndarray, roi_size: int, overlap: int = 0) -> np.ndarray:
    step = roi_size - overlap
    crops = []
    for dim in image.shape:
        counts = (dim - overlap) // step
        crops.append(dim - step * counts - overlap)
    return image[crops[0]:, crops[1]:, crops[2]:]


def diagnose_network(params_or_grads, name="network"):
    """Print the mean of per-leaf mean-|value| over a gradient pytree
    (util/util.py:121-137 — there: mean |grad| over torch parameters;
    here the caller passes the grad pytree from the fused step)."""
    import jax

    leaves = [np.asarray(l) for l in jax.tree_util.tree_leaves(params_or_grads)]
    mean = 0.0
    count = 0
    for leaf in leaves:
        mean += float(np.mean(np.abs(leaf)))
        count += 1
    if count > 0:
        mean = mean / count
    print(name)
    print(mean)
    return mean


def save_image(image_numpy, image_path, aspect_ratio=1.0, save_all=False):
    """PIL single-image writer (util/util.py:140-154)."""
    from PIL import Image

    Image.fromarray(image_numpy).save(image_path, save_all=save_all)


def print_numpy(x, val=True, shp=False):
    """Array summary printer (util/util.py:157-170)."""
    x = np.asarray(x).astype(np.float64)
    if shp:
        print("shape,", x.shape)
    if val:
        x = x.flatten()
        print("mean = %3.3f, min = %3.3f, max = %3.3f, median = %3.3f, std=%3.3f"
              % (np.mean(x), np.min(x), np.max(x), np.median(x), np.std(x)))


def mkdirs(paths):
    """Create directories for a path or list of paths (util/util.py:173-185)."""
    if isinstance(paths, list) and not isinstance(paths, str):
        for path in paths:
            mkdir(path)
    else:
        mkdir(paths)


def mkdir(path):
    """Create a single directory if missing (util/util.py:188-193)."""
    os.makedirs(path, exist_ok=True)
