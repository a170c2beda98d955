"""Headline benchmark: 900^3 dice inference voxel rate (+ 108^3 train step).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

Baselines (BASELINE.md): reference inference on GTX 1080-Ti = ~2.0 Mvoxel/s
(900^3 in 5-8 min); reference training = 0.16 it/s.  TPU targets: 900^3
inference < 30 s (~24 Mvoxel/s) on a v5p-8; here we run on a single chip.

Env knobs: BENCH_SIZE (default 900), BENCH_ROI/BENCH_OV/BENCH_BC (tile
geometry, default 204/15/10), BENCH_TILE_BATCH (default 1 — HBM-safe at
ext 224^3), BENCH_PRECISION (default bfloat16), BENCH_TRAIN=0 to skip the
train-step timing.
"""

import json
import os
import statistics
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))

# honour JAX_PLATFORMS even on hosts whose sitecustomize re-forces a TPU
# plugin after env-var selection
if os.environ.get("JAX_PLATFORMS"):
    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass


def bench_inference(size: int, tile_batch: int) -> float:
    from neuroclear_tpu.data.dicing import DiceGrid
    from neuroclear_tpu.nn import generators as G
    from neuroclear_tpu.parallel.dice_infer import DiceInferencePipeline
    from neuroclear_tpu.utils.imageops import pad_for_dicing

    # roi 204 + border 10 -> 224^3 net input (div by 4 for the U-Net pools);
    # vs the README's 120-cube example this cuts overlap-redundant compute
    # ~30% at 900^3 while keeping the same blend contract.
    roi = int(os.environ.get("BENCH_ROI", "204"))
    ov = int(os.environ.get("BENCH_OV", "15"))
    bc = int(os.environ.get("BENCH_BC", "10"))
    rng = np.random.default_rng(0)
    vol = rng.integers(0, 65535, (size, size, size), dtype=np.uint16)
    vp = pad_for_dicing(vol, roi, ov)
    grid = DiceGrid(vp.shape, roi, ov, bc)

    g = G.UNetDeconv(1, 1, norm="instance")
    params = g.init(jax.random.PRNGKey(0), "kaiming", 0.02)
    precision = os.environ.get("BENCH_PRECISION", "bfloat16")
    pipe = DiceInferencePipeline(g.apply, params, grid, 1 / 65535.0,
                                 tile_batch=tile_batch, precision=precision,
                                 out_dtype=np.uint16, orig_shape=vol.shape)

    t0 = time.time()
    out = pipe.run_streaming(vp)
    compile_run = time.time() - t0
    t0 = time.time()
    out = pipe.run_streaming(vp)
    dt = time.time() - t0
    del out
    n_vox = size ** 3
    print(f"# inference {size}^3: first(compile+run) {compile_run:.1f}s, "
          f"steady {dt:.2f}s -> {n_vox / dt / 1e6:.1f} Mvoxel/s",
          file=sys.stderr)
    return n_vox / dt


def bench_train() -> float:
    import argparse

    from neuroclear_tpu.models.axial_to_lateral_gan_apollo_model import (
        AxialToLateralGANApolloModel)

    opt = argparse.Namespace(
        isTrain=True, image_dimension=3, checkpoints_dir="/tmp/bench_ck",
        name="bench", gpu_ids=[], input_nc=1, output_nc=1, ngf=64, ndf=64,
        netG="unet_deconv", netG_B="deep_linear_gen", netD="basic",
        n_layers_D=3, norm="instance", init_type="kaiming", init_gain=0.02,
        no_dropout=True, gan_mode="lsgan", lambda_A=5.0, lambda_plane=[1, 1, 1],
        randomize_projection_depth=True, projection_depth=10,
        min_projection_depth=2, beta1=0.1, lr=1e-4, direction="AtoB",
        lr_policy="constant", n_epochs=100, n_epochs_decay=100, epoch_count=1,
        lr_decay_iters=50, continue_train=False, load_iter=0, epoch="latest",
        verbose=False, seed=0,
        precision=os.environ.get("BENCH_PRECISION", "bfloat16"))
    import contextlib

    with contextlib.redirect_stdout(sys.stderr):  # keep stdout = 1 JSON line
        m = AxialToLateralGANApolloModel(opt)
        m.setup(opt)
    x = np.random.rand(1, 108, 108, 108, 1).astype(np.float32)
    m.set_input({"A": x, "A_paths": "bench"})
    m.optimize_parameters()
    _ = m.get_current_losses()  # sync (compile)
    ts = []
    for _i in range(5):
        t0 = time.time()
        m.optimize_parameters()
        _ = m.get_current_losses()
        ts.append(time.time() - t0)
    step = statistics.median(ts)
    print(f"# train 108^3: {step * 1000:.0f} ms/it -> {1 / step:.2f} it/s",
          file=sys.stderr)
    return 1.0 / step


def main():
    size = int(os.environ.get("BENCH_SIZE", "900"))
    # tile_batch 1 at roi 204 (ext 224^3) is the HBM-safe default on 16GB
    tile_batch = int(os.environ.get("BENCH_TILE_BATCH", "1"))
    vox_per_s = bench_inference(size, tile_batch)

    extra = {}
    if os.environ.get("BENCH_TRAIN", "1") != "0":
        try:
            extra["train_iters_per_sec_108"] = round(bench_train(), 3)
            extra["train_vs_baseline"] = round(
                extra["train_iters_per_sec_108"] / 0.16, 2)
        except Exception as e:  # keep the headline metric robust
            print(f"# train bench failed: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "dice_inference_voxels_per_sec",
        "value": round(vox_per_s, 1),
        "unit": "voxel/s",
        "vs_baseline": round(vox_per_s / 2.0e6, 2),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
