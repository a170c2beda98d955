"""Quality diagnostics for the simulation study — decomposes WHERE the
output differs from ground truth, beyond the single PSNR number of
test_dice (reference protocol: /root/reference/test_dice.py:229-263).

Reports, for input-vs-GT and output-vs-GT:
  * protocol PSNR (standardize -> min-max uint8, applied twice, as the
    reference does) and plain affine-optimal PSNR (best a*x+b fit — the
    upper bound any global intensity correction could reach)
  * per-axis gradient energy (axial/lateral sharpness isotropy — the
    capability the model exists to deliver; GT is ~1.0)
  * Pearson correlation with GT
  * foreground/background split stats (GT>thresh defines foreground):
    background RMS (hallucination/noise) and foreground RMS (bead fidelity)

Usage:
  python scripts/diagnose_quality.py --input <in.tif> --output <out.tif> \
      --gt <gt.tif> [--thresh 0.05]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from neuroclear_tpu.utils import imageops, tiffio


def to_f32(v):
    v = np.asarray(v)
    if np.issubdtype(v.dtype, np.integer):
        return v.astype(np.float32) / np.iinfo(v.dtype).max
    return v.astype(np.float32)


def protocol_psnr(a, b):
    """The reference's metric protocol (test_dice.py:241-251): standardize +
    min-max to uint8, twice, then PSNR at datarange 255."""
    for _ in range(2):
        a = imageops.normalize(imageops.standardize(a), data_type=np.uint8)
        b = imageops.normalize(imageops.standardize(b), data_type=np.uint8)
    return imageops.get_psnr(a, b, 255)


def affine_optimal_psnr(x, gt):
    """PSNR after the globally optimal affine map a*x+b -> gt (least
    squares) — isolates structural error from pure intensity drift."""
    x = x.ravel().astype(np.float64)
    g = gt.ravel().astype(np.float64)
    vx = x.var()
    a = ((x * g).mean() - x.mean() * g.mean()) / max(vx, 1e-12)
    b = g.mean() - a * x.mean()
    mse = np.mean((a * x + b - g) ** 2)
    rng = g.max() - g.min()
    return 10 * np.log10(rng * rng / max(mse, 1e-20))


def gradient_energy(v):
    """Mean squared finite difference along each axis (z, y, x)."""
    return [float(np.mean(np.diff(v, axis=ax) ** 2)) for ax in range(3)]


def report(tag, x, gt, thresh):
    pp = protocol_psnr(x, gt)
    ap = affine_optimal_psnr(x, gt)
    corr = float(np.corrcoef(x.ravel(), gt.ravel())[0, 1])
    gz, gy, gx = gradient_energy(x)
    iso = gz / (0.5 * (gy + gx) + 1e-20)
    fg = gt > thresh
    bg_rms = float(np.sqrt(np.mean((x[~fg] - gt[~fg]) ** 2)))
    fg_rms = float(np.sqrt(np.mean((x[fg] - gt[fg]) ** 2))) if fg.any() else 0.0
    print(f"{tag:>8}: protocolPSNR {pp:6.2f}  affine-optPSNR {ap:6.2f}  "
          f"corr {corr:.4f}  axial/lateral-grad {iso:.3f}  "
          f"bgRMS {bg_rms:.4f}  fgRMS {fg_rms:.4f}  "
          f"[mean {x.mean():.4f} std {x.std():.4f}]")
    return {"protocol_psnr": pp, "affine_psnr": ap, "corr": corr, "iso": iso,
            "bg_rms": bg_rms, "fg_rms": fg_rms}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=False)
    ap.add_argument("--output", required=True)
    ap.add_argument("--gt", required=True)
    ap.add_argument("--thresh", type=float, default=0.05)
    ap.add_argument("--stride", type=int, default=0,
                    help="subsample stride for the statistics (0 = auto: "
                         "2 for volumes over 400^3); PSNRs remain "
                         "representative, not bit-identical to test_dice")
    args = ap.parse_args()

    gt = to_f32(tiffio.imread(args.gt))
    out = to_f32(tiffio.imread(args.output))
    z, y, x = (min(a, b) for a, b in zip(gt.shape, out.shape))
    s = args.stride or (2 if min(z, y, x) > 400 else 1)
    if s > 1:
        print(f"(stride-{s} subsample for statistics)")
    gt = gt[:z:s, :y:s, :x:s]
    out = out[:z:s, :y:s, :x:s]
    z, y, x = gt.shape
    gt_c = gt[:z, :y, :x]
    print(f"volumes: gt {gt.shape} out {out.shape} -> compared {(z, y, x)}")
    ggz, ggy, ggx = gradient_energy(gt_c)
    print(f"      gt: axial/lateral-grad {ggz / (0.5 * (ggy + ggx)):.3f}  "
          f"[mean {gt_c.mean():.4f} std {gt_c.std():.4f}]")
    if args.input:
        inp = to_f32(tiffio.imread(args.input))
        inp = inp[:inp.shape[0]:s, :inp.shape[1]:s, :inp.shape[2]:s][:z, :y, :x]
        report("input", inp, gt_c, args.thresh)
    report("output", out[:z, :y, :x], gt_c, args.thresh)
