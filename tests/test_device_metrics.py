"""Parity: device-streamed protocol metrics vs the host float64 path.

The device path (neuroclear_tpu/parallel/metrics.py) must reproduce
test_dice.compute_gt_metrics' math — double standardize+normalize(uint8)
(reference test_dice.py:241-247 semantics), PSNR (util/util.py:101-119),
and the chunked valid-window SSIM — within f32 streaming tolerance.
"""

import numpy as np
import pytest

from neuroclear_tpu.parallel import metrics as dm
from neuroclear_tpu.utils import imageops


def _host_protocol(real, fake, gt):
    for _ in range(2):
        real = imageops.normalize(imageops.standardize(real), np.uint8)
        fake = imageops.normalize(imageops.standardize(fake), np.uint8)
        gt = imageops.normalize(imageops.standardize(gt), np.uint8)
    return {
        "psnr_input": imageops.get_psnr(real, gt, 255),
        "psnr_output": imageops.get_psnr(fake, gt, 255),
        "ssim_input": imageops.get_ssim(real, gt, 255),
        "ssim_output": imageops.get_ssim(fake, gt, 255),
    }


@pytest.mark.parametrize("shape,slab", [((32, 28, 26), 9), ((17, 16, 15), 64)])
def test_protocol_metrics_parity(shape, slab):
    rng = np.random.default_rng(0)
    gt = rng.integers(0, 60000, size=shape).astype(np.uint16)
    real = np.clip(gt.astype(np.int32)
                   + rng.normal(0, 4000, shape).astype(np.int32),
                   0, 65535).astype(np.uint16)
    fake = np.clip(gt.astype(np.int32)
                   + rng.normal(0, 1500, shape).astype(np.int32),
                   0, 65535).astype(np.uint16)

    host = _host_protocol(real, fake, gt)
    dev = dm.protocol_metrics(real, fake, gt, slab=slab)

    for k in host:
        tol = 1e-3 if k.startswith("psnr") else 1e-4
        assert abs(host[k] - dev[k]) < tol, (k, host[k], dev[k])


def test_quant_lut_bit_exact():
    """lut[vol] must equal the host double-quantise chain bit-for-bit --
    the protocol's second round sits on truncation edges, so anything less
    drifts the metrics (see metrics._round_lut)."""
    rng = np.random.default_rng(3)
    for scale in (60000, 900, 2):
        v = rng.integers(0, scale, size=(13, 11, 9)).astype(np.uint16)
        h = v
        for _ in range(2):
            h = imageops.normalize(imageops.standardize(h), np.uint8)
        assert np.array_equal(dm._quant_lut(v)[v], h)


def test_rejects_bad_shapes():
    a = np.zeros((8, 8, 8), np.uint16)
    with pytest.raises(ValueError):
        dm.protocol_metrics(a, a, np.zeros((8, 8, 7), np.uint16))
    with pytest.raises(ValueError):
        dm.protocol_metrics(a[:5], a[:5], a[:5])  # < SSIM window
