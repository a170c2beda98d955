"""Measure conv formulations for the U-Net's hot cout=64 3x3x3 layers.

Compares, loop-in-jit with a terminal host transfer (the only timing this
environment's async tunnel can't fake — verify SKILL.md):

  * xla:    lax.conv_general_dilated, the current production path
  * zpack2: ops/conv_zpack.py output-z-pair packed conv (cout 64 -> 128)

at the production shapes: 148^3 (training crop) and 224^3 (inference ext
tile), cin 64 and 128 (double_conv1 second conv / ex_conv1_1).

Usage: python scripts/bench_conv_kernels.py [reps] [sizes...]
Env: CONV_BENCH_CIN="64 128", CONV_BENCH_DTYPE=bfloat16
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))
if os.environ.get("JAX_PLATFORMS"):
    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

from neuroclear_tpu.ops.conv_wpack import conv3d_wpack2  # noqa: E402
from neuroclear_tpu.ops.conv_zpack import conv3d_zpack2  # noqa: E402
from neuroclear_tpu.ops import pallas_wconv  # noqa: E402


def conv_xla(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1, 1), padding=((1, 1),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def timed(fn, x, w, reps):
    """scan `reps` applications in ONE jit; time ends in a host float.

    Each step's input depends on the previous step's OUTPUT via a scalar
    (x * (1 + 0-ish * y[0])), so XLA cannot hoist the conv out of the loop
    (a loop-invariant `fn(x, w)` gets computed once — measured 296 'TFLOP/s'
    before this guard).  The dependence costs one elementwise pass over x
    (~1 ms at HBM speed), subtracted nothing — reported rates are lower
    bounds within a few %."""

    @jax.jit
    def loop(x, w):
        def body(h, _):
            y = fn(h, w)
            s = y.reshape(-1)[0].astype(h.dtype)
            return h * (1 + s * 1e-12), y.mean().astype(jnp.float32)
        _, ys = jax.lax.scan(body, x, None, length=reps)
        return ys.sum()

    r = float(loop(x, w))  # compile + run
    t0 = time.time()
    r = float(loop(x, w))
    dt = time.time() - t0
    return dt / reps, r


def timed_grad(fn, x, w, reps):
    """Like timed() but each step runs forward + full VJP (dx and dw), with
    the same anti-hoist scalar chain threaded through dx."""

    @jax.jit
    def loop(x, w):
        def body(h, _):
            y, vjp = jax.vjp(fn, h, w)
            dx, dw = vjp(y)
            s = dx.reshape(-1)[0].astype(h.dtype)
            return h * (1 + s * 1e-12), (y.mean()
                                         + dw.sum()).astype(jnp.float32)
        _, ys = jax.lax.scan(body, x, None, length=reps)
        return ys.sum()

    r = float(loop(x, w))  # compile + run
    t0 = time.time()
    r = float(loop(x, w))
    dt = time.time() - t0
    return dt / reps, r


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sizes = [int(s) for s in sys.argv[2:]] or [148, 224]
    cins = [int(c) for c in os.environ.get("CONV_BENCH_CIN", "64 128").split()]
    dt_name = os.environ.get("CONV_BENCH_DTYPE", "bfloat16")
    dtype = jnp.bfloat16 if dt_name == "bfloat16" else jnp.float32
    cout = 64

    rng = np.random.default_rng(0)
    print(f"# backend={jax.default_backend()} dtype={dt_name} reps={reps}")

    # parity first (small shape, f32 reference)
    xs = jnp.asarray(rng.standard_normal((1, 16, 24, 24, 64)), jnp.float32)
    ws = jnp.asarray(rng.standard_normal((3, 3, 3, 64, 64)) * 0.05, jnp.float32)
    ref = conv_xla(xs, ws)
    got = conv3d_zpack2(xs, ws)
    err = float(jnp.max(jnp.abs(ref - got)) / jnp.max(jnp.abs(ref)))
    print(f"# zpack2 parity (f32 16x24x24): rel err {err:.2e}")
    assert err < 2e-3

    for size in sizes:
        for cin in cins:
            shape = (1, size, size, size, cin)
            x = jnp.asarray(rng.standard_normal(shape), dtype)
            w = jnp.asarray(
                rng.standard_normal((3, 3, 3, cin, cout)) * 0.05, dtype)
            flops = 2 * size ** 3 * 27 * cin * cout
            grad_mode = os.environ.get("CONV_BENCH_GRAD", "0") == "1"
            fns = [("xla", conv_xla, None), ("zpack2", conv3d_zpack2, None),
                   ("wpack2", conv3d_wpack2, None)]
            if pallas_wconv.supported((1, size, size, size, cin),
                                      cin, cout, 3, 1, 1, 3):
                if grad_mode:
                    # both backward routes of the Pallas forward
                    fns.append(("wpl+xbwd",
                                pallas_wconv.conv3d_wpack_pallas, False))
                    fns.append(("wpl+pbwd",
                                pallas_wconv.conv3d_wpack_pallas, True))
                else:
                    fns.append(("wpallas",
                                pallas_wconv.conv3d_wpack_pallas, None))
            if grad_mode:
                flops *= 3  # fwd + dx + dw
            for name, fn, pbwd in fns:
                if pbwd is not None:
                    pallas_wconv._BWD_ENV = pbwd  # trace-time switch
                try:
                    t, _ = (timed_grad if grad_mode else timed)(fn, x, w,
                                                                reps)
                    print(f"{size}^3 cin{cin}->64 {name:8s}: "
                          f"{t * 1e3:7.2f} ms  {flops / t / 1e12:6.1f} TFLOP/s",
                          flush=True)
                except Exception as e:
                    print(f"{size}^3 cin{cin}->64 {name:8s}: FAILED "
                          f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
