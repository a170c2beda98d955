"""Analytic FLOP count of the fused apollo train step -> MFU statement.

Traces the jitted step (no compile, no device) and walks the jaxpr
counting matmul/conv FLOPs — the MXU work that MFU conventionally
measures (elementwise/norm/reduction FLOPs are bandwidth-bound and
excluded, as in the usual MFU definition).  Runs on CPU in seconds;
safe beside a TPU study (no XLA compile, no device contention).

Usage: python scripts/count_step_flops.py [--crop 148] [--step-seconds 1.72]
"""

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")


def _conv_flops(eqn) -> float:
    out = eqn.outvars[0].aval
    lhs = eqn.invars[0].aval
    rhs = eqn.invars[1].aval
    dn = eqn.params["dimension_numbers"]
    # contraction size per output element: prod(kernel spatial) * C_in/groups
    # (rhs_spec[1] is already the per-group input-channel dim)
    k_spatial = [rhs.shape[i] for i in range(len(rhs.shape))
                 if i not in (dn.rhs_spec[0], dn.rhs_spec[1])]
    cin = rhs.shape[dn.rhs_spec[1]]
    del lhs
    return 2.0 * out.size * math.prod(k_spatial) * cin


def _dot_flops(eqn) -> float:
    lhs = eqn.invars[0].aval
    out = eqn.outvars[0].aval
    (lc, _), _ = eqn.params["dimension_numbers"]
    k = math.prod(lhs.shape[i] for i in lc)
    return 2.0 * out.size * k


def count_jaxpr(jaxpr, mult: float = 1.0) -> float:
    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "conv_general_dilated":
            total += mult * _conv_flops(eqn)
        elif name == "dot_general":
            total += mult * _dot_flops(eqn)
        elif name == "scan":
            inner = eqn.params["jaxpr"].jaxpr
            total += count_jaxpr(inner, mult * eqn.params["length"])
        elif name == "while":
            # no static trip count; count the body once (none in this model)
            total += count_jaxpr(eqn.params["body_jaxpr"].jaxpr, mult)
        elif name == "cond":
            branches = [count_jaxpr(b.jaxpr, mult)
                        for b in eqn.params["branches"]]
            total += max(branches) if branches else 0.0
        else:
            for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                sub = eqn.params.get(key)
                if sub is not None:
                    total += count_jaxpr(getattr(sub, "jaxpr", sub), mult)
                    break
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--crop", type=int, default=148)
    ap.add_argument("--step-seconds", type=float, default=1.72,
                    help="measured synced step time (bench leg_train)")
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--peak-tflops", type=float, default=197.0,
                    help="bf16 peak of the chip (v5e: 197 TFLOP/s)")
    a = ap.parse_args()

    from neuroclear_tpu.models.axial_to_lateral_gan_apollo_model import (
        AxialToLateralGANApolloModel)

    opt = argparse.Namespace(
        isTrain=True, image_dimension=3, checkpoints_dir="/tmp/flops_ck",
        name="flops", gpu_ids=[], input_nc=1, output_nc=1, ngf=64, ndf=64,
        netG="unet_deconv", netG_B="deep_linear_gen", netD="basic",
        n_layers_D=3, norm="instance", init_type="kaiming", init_gain=0.02,
        no_dropout=True, gan_mode="lsgan", lambda_A=5.0,
        lambda_plane=[1, 1, 1], randomize_projection_depth=True,
        projection_depth=10, min_projection_depth=2, beta1=0.1, lr=1e-4,
        direction="AtoB", lr_policy="constant", n_epochs=100,
        n_epochs_decay=100, epoch_count=1, lr_decay_iters=50,
        continue_train=False, load_iter=0, epoch="latest", verbose=False,
        seed=0, remat=not a.no_remat, precision="bfloat16")
    import contextlib
    with contextlib.redirect_stdout(sys.stderr):
        m = AxialToLateralGANApolloModel(opt)
        m.setup(opt)

    c = a.crop
    real = jax.ShapeDtypeStruct((1, c, c, c, 1), np.float32)
    lr = jax.ShapeDtypeStruct((), np.float32)
    g_params = {k: m.params[k] for k in ("G_A", "G_B")}
    d_params = {k: m.params[k] for k in m.model_names[2:]}
    traced = m._step.trace(g_params, d_params, m.opt_state, m.next_rng(),
                           real, lr)
    flops = count_jaxpr(traced.jaxpr.jaxpr)
    tf = flops / 1e12
    t = a.step_seconds
    basis = ("model FLOPs, no remat recompute" if a.no_remat
             else "hardware FLOPs incl. remat recompute")
    print(f"apollo fused step @ {c}^3 ({basis}): "
          f"{tf:.2f} TFLOP (matmul/conv only)")
    print(f"at {t:.2f} s/it synced -> {tf / t:.1f} TFLOP/s achieved; "
          f"MFU vs {a.peak_tflops:.0f} bf16 peak = {tf / t / a.peak_tflops:.1%}")


if __name__ == "__main__":
    main()
