"""Generate a synthetic bead simulation dataset (input / ground-truth /
rotated volumes), re-creating the reference's missing
"Data Generator for Simulation" notebook (README.md:112-116).

Usage:
  python scripts/generate_synthetic.py --out /data/sim --size 300 --seed 0
Writes:
  <out>/input/bead_input.tif      (blurred+noisy training volume)
  <out>/gt/bead_gt.tif            (sharp isotropic ground truth)
  <out>/rotated/bead_rotated.tif  (90-degree rotated ground truth)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from neuroclear_tpu.utils import tiffio
from neuroclear_tpu.utils.synthetic import (generate_artifact_volume,
                                            generate_bead_volume)

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--mode", choices=["bead", "artifact"], default="bead",
                    help="bead: axially blurred+noisy volume (apollo/dryops "
                         "isotropization study); artifact: per-plane jitter"
                         "+flicker OT-LSM calibration damage (athena study)")
    ap.add_argument("--size", type=int, default=300)
    ap.add_argument("--n_beads", type=int, default=None)
    ap.add_argument("--axial_sigma", type=float, default=None,
                    help="PSF sigma_z (default 6.0 bead / 2.0 artifact)")
    ap.add_argument("--jitter_px", type=float, default=2.0,
                    help="artifact mode: max per-plane translation (px)")
    ap.add_argument("--flicker_sigma", type=float, default=0.15,
                    help="artifact mode: per-plane gain sigma")
    ap.add_argument("--gauss_noise", type=float, default=0.01,
                    help="read-noise sigma (fraction of full scale)")
    ap.add_argument("--poisson_peak", type=float, default=200.0,
                    help="photon count at intensity 1.0 (higher = less "
                         "shot noise)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--preset", choices=["s4"], default=None,
                    help="named study recipe (overrides individual knobs): "
                         "s4 = sigma_z=4 / 2x bead density / half read "
                         "noise / 2x photon count — the round-3 "
                         "isotropization+PSNR regime (docs/QUALITY.md)")
    args = ap.parse_args()

    if args.preset == "s4":
        args.axial_sigma = 4.0
        args.gauss_noise = 0.005
        args.poisson_peak = 400.0
        if args.n_beads is None:
            args.n_beads = max(50, int(2400 * (args.size / 300) ** 3))

    n_beads = args.n_beads
    if n_beads is None:
        n_beads = max(50, int(1200 * (args.size / 300) ** 3))

    shape = (args.size,) * 3
    if args.mode == "artifact":
        noisy, gt, rotated = generate_artifact_volume(
            shape=shape, n_beads=n_beads,
            axial_sigma=(2.0 if args.axial_sigma is None else args.axial_sigma),
            jitter_px=args.jitter_px, flicker_sigma=args.flicker_sigma,
            gauss_noise=args.gauss_noise, poisson_peak=args.poisson_peak,
            seed=args.seed)
    else:
        noisy, gt, rotated = generate_bead_volume(
            shape=shape, n_beads=n_beads,
            axial_sigma=(6.0 if args.axial_sigma is None else args.axial_sigma),
            gauss_noise=args.gauss_noise, poisson_peak=args.poisson_peak,
            seed=args.seed)
    tiffio.imwrite(os.path.join(args.out, "input", "bead_input.tif"), noisy)
    tiffio.imwrite(os.path.join(args.out, "gt", "bead_gt.tif"), gt)
    tiffio.imwrite(os.path.join(args.out, "rotated", "bead_rotated.tif"), rotated)
    print(f"wrote {args.size}^3 synthetic dataset to {args.out}")
