"""HBM footprint study of the fused apollo train step (round-3 target:
C=1 layout packing — docs/PERFORMANCE.md "Round-3 targets").

Compiles the apollo optimize_parameters program AOT at a given crop size
and prints XLA's memory analysis (peak HBM, argument/output/temp sizes)
plus the largest buffer-assignment entries, WITHOUT running a step.  Use
on the real chip to see where the 148^3 step's ~15 GB peak lives and how
much the C=1 volume padding (lane tiling of NDHWC feature dim) costs.

Usage:  python scripts/mem_study.py [--crop 148] [--remat] [--bf16]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--crop", type=int, default=148)
    ap.add_argument("--model", default="axial_to_lateral_gan_apollo",
                    help="model variant to analyze (apollo/athena/dryops)")
    ap.add_argument("--conversion_plane", nargs=2, default=["yz", "xy"],
                    help="athena/dryops source+target planes")
    ap.add_argument("--remat", action="store_true", default=True)
    ap.add_argument("--no-remat", dest="remat", action="store_false")
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--hlo", action="store_true",
                    help="also dump the largest-buffer HLO lines")
    args = ap.parse_args()

    import numpy as np

    from neuroclear_tpu.models import create_model
    from neuroclear_tpu.options.train_options import TrainOptions

    c = args.crop
    argv = [
        "--dataroot", "/tmp/unused", "--name", "memstudy",
        "--checkpoints_dir", "/tmp/memstudy",
        "--model", args.model,
        "--dataset_mode", "singlevolume",
        "--netG", "unet_deconv", "--netG_B", "deep_linear_gen",
        "--netD", "basic", "--gan_mode", "lsgan", "--init_type", "kaiming",
        "--norm", "instance", "--batch_size", "1",
        "--lambda_A", "5",
        "--crop_size", str(c), str(c), str(c),
        "--lr_policy", "constant", "--seed", "0",
    ]
    if "apollo" in args.model:
        argv += ["--lambda_plane", "1", "1", "1",
                 "--randomize_projection_depth", "--projection_depth", "10"]
    else:
        argv += ["--conversion_plane"] + list(args.conversion_plane)
    if not args.f32:
        argv += ["--precision", "bfloat16"]
    if args.remat:
        argv += ["--remat"]
    opt = TrainOptions().parse(args=argv)
    model = create_model(opt)
    model.setup(opt)

    import jax.numpy as jnp

    x = np.zeros((1, c, c, c, 1), np.float32)
    model.set_input({"A": x, "A_paths": "mem"})
    # AOT-compile the fused step exactly as optimize_parameters invokes it
    # (apollo_model.optimize_parameters), but stop at compile — nothing runs.
    lr = jnp.float32(model.base_lr * model.lr_scale)
    g_params = {k: model.params[k] for k in ("G_A", "G_B")}
    d_params = {k: model.params[k] for k in model.model_names[2:]}
    if "apollo" in args.model:
        lowered = model._step.lower(g_params, d_params, model.opt_state,
                                    model.next_rng(), model.real, lr)
    else:  # athena/dryops: deterministic all-slices step, no PRNG arg
        lowered = model._step.lower(g_params, d_params, model.opt_state,
                                    model.real, lr)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    print(ma)
    ga = getattr(ma, "generated_code_size_in_bytes", None)
    for k in ("temp_size_in_bytes", "argument_size_in_bytes",
              "output_size_in_bytes", "alias_size_in_bytes",
              "peak_memory_in_bytes"):
        v = getattr(ma, k, None)
        if v is not None:
            print(f"{k:28s} {v/2**30:8.2f} GiB")
    if ga:
        print(f"{'generated_code_size':28s} {ga/2**20:8.2f} MiB")

    if args.hlo:
        txt = compiled.as_text()
        sys.stdout.write("\n".join(
            ln for ln in txt.splitlines() if "allocation" in ln)[:8000])


if __name__ == "__main__":
    main()
