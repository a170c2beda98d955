"""Recompute quality metrics from SAVED volumes — no device needed.

Reproduces test_dice.py's metric path (compute_gt_metrics: percentile-stretch
the input like the --normalize_intensity inference did, then the reference's
double standardize -> min-max-uint8 protocol, PSNR at datarange 255, plus the
chunked SSIM), and appends the RAW-volume rows (no percentile stretch:
protocol PSNR / affine-optimal PSNR / correlation / axial-lateral gradient
ratio via scripts/diagnose_quality.py report()) so the quality win can be
shown under both protocols (VERDICT r2: "raw-protocol quality row").

Usage:
  python scripts/eval_saved_volumes.py --input <raw_input.tif> \
      --output <saved_output.tif> --gt <gt.tif> [--sat_level 0.25 99.75]

Note: the saved output volume already carries the inference-time percentile
stretch (--normalize_intensity), so its raw row measures the stretched
output against the raw GT — the z-score in the protocol absorbs the global
affine part of the stretch; clipping effects are the model's own.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from neuroclear_tpu.utils import imageops, tiffio  # noqa: E402
from diagnose_quality import report, to_f32  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--gt", required=True)
    ap.add_argument("--sat_level", type=float, nargs=2, default=[0.25, 99.75])
    ap.add_argument("--stride", type=int, default=2,
                    help="subsample stride for the raw-row statistics")
    ap.add_argument("--thresh", type=float, default=0.05)
    args = ap.parse_args()

    raw_in = tiffio.imread(args.input)
    gt = tiffio.imread(args.gt)
    out = tiffio.imread(args.output)

    # --- the test_dice metric path -------------------------------------
    # input gets the same stretch the inference applied to the output
    scale = float(np.iinfo(raw_in.dtype).max) if np.issubdtype(
        raw_in.dtype, np.integer) else 1.0
    real_f = raw_in.astype(np.float32) / scale
    p1, p99 = np.percentile(real_f, tuple(args.sat_level))
    real = imageops.rescale_intensity(real_f, in_range=(p1, p99))
    real = (real * (2 ** 16 - 1)).astype(np.uint16)
    del real_f

    fake = out
    gt_v = gt
    for _ in range(2):
        real = imageops.normalize(imageops.standardize(real), np.uint8)
        fake = imageops.normalize(imageops.standardize(fake), np.uint8)
        gt_v = imageops.normalize(imageops.standardize(gt_v), np.uint8)
    print("== protocol rows (test_dice compute_gt_metrics parity) ==")
    print(f"input  vs GT: psnr {imageops.get_psnr(real, gt_v, 255):.4f}  "
          f"ssim {imageops.get_ssim(real, gt_v, 255):.4f}")
    print(f"output vs GT: psnr {imageops.get_psnr(fake, gt_v, 255):.4f}  "
          f"ssim {imageops.get_ssim(fake, gt_v, 255):.4f}")
    del real, fake, gt_v

    # --- raw rows ------------------------------------------------------
    s = args.stride
    gt_f = to_f32(gt)[::s, ::s, ::s]
    z, y, x = gt_f.shape
    print(f"== raw rows (stride-{s} statistics, no percentile stretch) ==")
    inp_f = to_f32(raw_in)[::s, ::s, ::s][:z, :y, :x]
    report("input", inp_f, gt_f, args.thresh)
    del inp_f
    out_f = to_f32(out)[::s, ::s, ::s][:z, :y, :x]
    report("output", out_f, gt_f, args.thresh)


if __name__ == "__main__":
    main()
