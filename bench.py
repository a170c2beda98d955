"""Headline benchmark: 900^3 dice inference voxel rate + train step timings.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}
ALWAYS — any failure is reported inside the JSON (`extra.error` / per-leg
error strings), never as a bare traceback with no line (the round-3 record
died rc=1 with no JSON exactly that way).

Baselines (BASELINE.md): reference inference on GTX 1080-Ti = ~2.0 Mvoxel/s
(900^3 in 5-8 min, README tile geometry 120/15/10); reference training =
0.16 it/s at 148^3 crops (11k iters / ~19 h).  TPU targets: 900^3 inference
< 30 s (~24 Mvoxel/s) on a v5p-8; here we run on a single chip.

Apples-to-apples notes (VERDICT r1 #3):
  * the headline train number is the 148^3 crop (the BASELINE operating
    point), measured synchronously (each step fetches its losses);
    108^3 (the README example command's crop) is reported alongside.
  * inference is reported for BOTH the README tile geometry (120/15/10)
    and the throughput geometry (204/15/10, ~35% less overlap-redundant
    compute); vs_baseline uses the README geometry so the ratio is
    measured like-for-like.

Isolation (VERDICT r3 weak #1): every leg runs in a FRESH SUBPROCESS, so a
leg that dies (RESOURCE_EXHAUSTED, kernel-compile regression, wedged
tunnel) releases its HBM with its process and cannot poison the next leg's
allocator or hang the whole bench — the parent applies a per-leg timeout
and keeps going.

Env knobs: BENCH_SIZE (default 900), BENCH_TILE_BATCH (default 1 —
HBM-safe at ext 224^3), BENCH_PRECISION (default bfloat16),
BENCH_TRAIN=0 to skip train timings, BENCH_FAST_ONLY=1 to skip the
roi-204 throughput-geometry run, BENCH_LEG_TIMEOUT (default 1500 s),
BENCH_TOTAL_BUDGET (default 1800 s — global deadline across ALL legs;
legs that no longer fit are skipped and the partial record is emitted).
"""

import argparse
import json
import os
import signal
import statistics
import subprocess
import sys
import time

import numpy as np

# ---- total-budget + partial-emission state (VERDICT r4 weak #1) ----------
# The driver wraps `python bench.py` in a wall-clock `timeout`; round 4 died
# rc=124 mid-leg with NO JSON because nothing bounded the SUM of the legs
# and SIGTERM was unhandled.  Now: (a) a global deadline gates every leg —
# when the remaining budget cannot fit a leg it is skipped, not started;
# (b) the record dict is built INCREMENTALLY so a SIGTERM at any moment
# emits whatever legs already landed.
_T0 = time.time()
_TOTAL_BUDGET = float(os.environ.get("BENCH_TOTAL_BUDGET", "1800"))
_EMIT_RESERVE = 15.0  # seconds kept back for banking + the JSON print
_RECORD = {"metric": "dice_inference_voxels_per_sec", "value": None,
           "unit": "voxel/s", "vs_baseline": None, "extra": {}}
_EMITTED = False
_CHILD = None  # the currently-running leg subprocess (killed on SIGTERM)


def _remaining() -> float:
    return _TOTAL_BUDGET - (time.time() - _T0) - _EMIT_RESERVE


def _emit():
    global _EMITTED
    if _EMITTED:
        return
    _EMITTED = True
    print(json.dumps(_RECORD), flush=True)


def _on_sigterm(signum, frame):
    _RECORD["extra"]["partial"] = "SIGTERM before all legs ran"
    _emit()
    if _CHILD is not None:
        try:
            _CHILD.kill()
        except Exception:
            pass
    os._exit(0)


def _setup_jax():
    import jax

    # repo-local persistent compile cache (git-tracked): round-end bench
    # legs must hit warm even after a VM recycle wipes ~/.cache
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    # honour JAX_PLATFORMS even on hosts whose sitecustomize re-forces a TPU
    # plugin after env-var selection
    if os.environ.get("JAX_PLATFORMS"):
        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass
    return jax


# --------------------------------------------------------------------------
# legs (each runs in its own subprocess; prints one JSON line on stdout)
# --------------------------------------------------------------------------

def leg_probe() -> dict:
    """Bounded device liveness + identity. The axon tunnel can wedge such
    that device init blocks forever; the parent's subprocess timeout bounds
    that here (no daemon-thread tricks needed)."""
    jax = _setup_jax()
    import jax.numpy as jnp

    ok = float(jnp.ones((256, 256)).sum()) == 256.0 * 256.0
    dev = jax.devices()[0]
    return {"ok": ok,
            "device": f"{dev.platform}:{getattr(dev, 'device_kind', '?')}"}


def leg_inference(size: int, tile_batch: int, roi: int, ov: int,
                  bc: int) -> dict:
    _setup_jax()
    import jax

    from neuroclear_tpu.data.dicing import DiceGrid
    from neuroclear_tpu.nn import generators as G
    from neuroclear_tpu.ops import pallas_wconv
    from neuroclear_tpu.parallel.dice_infer import DiceInferencePipeline
    from neuroclear_tpu.utils.imageops import pad_for_dicing

    # forward-only leg: the W-pair Pallas conv applies unless the parent
    # disabled it via NEUROCLEAR_PALLAS_WCONV=0 (retry path)
    if os.environ.get("NEUROCLEAR_PALLAS_WCONV") != "0":
        pallas_wconv.set_enabled(True)

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
    # drop the warmup's buffers before timing: back-to-back runs otherwise
    # stall ~20-30 s in device_put on HBM frees (allocator backpressure —
    # a bench artifact, not a property of a single inference)
    import gc
    del out
    gc.collect()
    time.sleep(2)
    t0 = time.time()
    out = pipe.run_streaming(vp)
    dt = time.time() - t0
    del out
    n_vox = size ** 3
    print(f"# inference {size}^3 roi{roi}/ov{ov}/bc{bc} B{tile_batch}: "
          f"first(compile+run) {compile_run:.1f}s, "
          f"steady {dt:.2f}s -> {n_vox / dt / 1e6:.1f} Mvoxel/s",
          file=sys.stderr)
    return {"vox_per_s": n_vox / dt, "steady_s": dt,
            "first_s": compile_run, "wpallas": pallas_wconv.ENABLED}


def leg_train(crop: int, remat: bool) -> dict:
    """Synchronous step time (each step fetches its losses — no async
    dispatch hiding) for the production apollo config at `crop`^3."""
    _setup_jax()

    from neuroclear_tpu.models.axial_to_lateral_gan_apollo_model import (
        AxialToLateralGANApolloModel)
    from neuroclear_tpu.ops import pallas_wconv

    # training scope: measure the production default — packed-resident
    # blocks and the Pallas W-conv are both opt-in for training (each OOMs
    # beside the 148^3 production footprint; docs/PERFORMANCE.md
    # "Packed-resident conv blocks")
    pallas_wconv.set_enabled(False)

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
        verbose=False, seed=0, remat=remat,
        precision=os.environ.get("BENCH_PRECISION", "bfloat16"))
    import contextlib

    with contextlib.redirect_stdout(sys.stderr):  # keep stdout = 1 JSON line
        m = AxialToLateralGANApolloModel(opt)
        m.setup(opt)
    x = np.random.rand(1, crop, crop, crop, 1).astype(np.float32)
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
    print(f"# train {crop}^3{' +remat' if remat else ''}: "
          f"{step * 1000:.0f} ms/it -> {1 / step:.2f} it/s", file=sys.stderr)
    return {"it_per_s": 1.0 / step, "step_ms": step * 1000}


# --------------------------------------------------------------------------
# parent orchestration
# --------------------------------------------------------------------------

def _stop_running_study():
    """Free the chip if a background quality-study driver is still training
    when the round-end bench fires (see utils/study_guard.py)."""
    from neuroclear_tpu.utils.study_guard import stop_running_study

    stop_running_study(bank=True,
                       log=lambda m: print(f"# bench: {m.lstrip('# ')}",
                                           file=sys.stderr))


def _run_leg(leg_args: list, timeout_s: float, env: dict | None = None):
    """Spawn `python bench.py --leg ...`; return (parsed_json, None) or
    (None, error_string).  The child's stderr passes through.  The per-leg
    timeout is clamped to the global remaining budget; a leg that cannot
    get at least 60 s is skipped outright (budget discipline beats a
    doomed cold compile)."""
    global _CHILD
    rem = _remaining()
    if rem < 60:
        return None, "skipped (total budget exhausted)"
    timeout_s = min(timeout_s, rem)
    cmd = [sys.executable, os.path.abspath(__file__)] + leg_args
    full_env = dict(os.environ)
    if env:
        full_env.update(env)
    _CHILD = subprocess.Popen(cmd, env=full_env, stdout=subprocess.PIPE,
                              text=True)
    try:
        out, _ = _CHILD.communicate(timeout=timeout_s)
        rc = _CHILD.returncode
    except subprocess.TimeoutExpired:
        _CHILD.kill()
        _CHILD.communicate()
        _CHILD = None
        return None, f"timeout after {timeout_s:.0f}s"
    _CHILD = None
    for line in reversed((out or "").strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line), None
            except json.JSONDecodeError:
                break
    tail = (out or "").strip().splitlines()[-3:]
    return None, f"rc={rc}, no JSON ({' | '.join(tail)[:300]})"


def main():
    size = int(os.environ.get("BENCH_SIZE", "900"))
    leg_timeout = float(os.environ.get("BENCH_LEG_TIMEOUT", "1500"))
    tile_batch = int(os.environ.get("BENCH_TILE_BATCH", "1"))

    signal.signal(signal.SIGTERM, _on_sigterm)
    _stop_running_study()

    extra = _RECORD["extra"]

    # liveness probe — ADVISORY: the axon tunnel recovers from wedge sprees
    # on minute timescales (observed: a probe failing 2x240s with the
    # device back 5 min later), so failed probes do NOT abort the bench;
    # they only mark the record and gate how much budget the legs get.
    probe_retries = int(os.environ.get("BENCH_PROBE_RETRIES", "2"))
    probe_ok = False
    for attempt in range(probe_retries):
        probe, err = _run_leg(["--leg", "probe"], timeout_s=300)
        if probe and probe.get("ok"):
            extra["device"] = probe.get("device")
            probe_ok = True
            break
        print(f"# device probe {attempt + 1}/{probe_retries} failed: {err}",
              file=sys.stderr)
        if attempt + 1 < probe_retries:
            time.sleep(60)
    if not probe_ok:
        extra["probe_failed"] = True
        print("# proceeding to the headline leg anyway (probe is advisory; "
              "its own timeout bounds a dead device)", file=sys.stderr)

    def inference(configs, roi):
        """Try (tile_batch, wpallas) configs in order, each in a fresh
        subprocess, so a failed attempt's HBM dies with its process (no
        allocator carry-over). Returns the first success."""
        errs = []
        for tb, wp in configs:
            args = ["--leg", "inference", "--size", str(size),
                    "--tile-batch", str(tb), "--roi", str(roi),
                    "--ov", "15", "--bc", "10"]
            res, err = _run_leg(args, leg_timeout,
                                env={"NEUROCLEAR_PALLAS_WCONV":
                                     "1" if wp else "0"})
            if res:
                if errs:
                    res["fallback"] = f"B{tb}/wp{int(wp)}"
                return res, None
            errs.append(f"B{tb}/wp{int(wp)}: {err}")
            print(f"# roi{roi} B{tb}/wp{int(wp)} failed ({err})",
                  file=sys.stderr)
        return None, "; ".join(errs)

    # README geometry FIRST — it is the headline (like-for-like vs the
    # reference's 120/15/10 example flags); a later-leg wedge cannot eat it.
    # Config chain from the round-4 hardware sweep (scripts/sweep_roi120.sh,
    # docs/PERFORMANCE.md): B=4+wpallas 5.8 Mvox/s > B=2+wpallas 5.0 >
    # B=2 XLA-only 4.2; B=4 WITHOUT the Pallas W-conv fails to fit, so the
    # fallback chain drops tile_batch before dropping the kernel.
    tb120 = int(os.environ.get("BENCH_TILE_BATCH_120", "4"))
    chain120 = [(tb120, True), (2, True), (2, False)] if probe_ok \
        else [(tb120, True)]
    r120, err120 = inference(chain120, 120)
    if not r120 and not probe_ok:
        # dead device confirmed twice over — don't burn hours of leg
        # timeouts; emit the record and stop
        extra["error"] = (f"device unavailable (probe failed and "
                          f"headline leg failed: {err120})")
        _emit()
        return
    if r120:
        extra["inference_vox_per_s_roi120"] = round(r120["vox_per_s"], 1)
        extra["wpallas_roi120"] = r120["wpallas"]
        if r120.get("fallback"):
            extra["fallback_roi120"] = r120["fallback"]
        # headline lands the moment the like-for-like leg does, so a later
        # SIGTERM still carries it (r4 lost a measured 4.4 Mvox/s this way)
        _RECORD["value"] = round(r120["vox_per_s"], 1)
        _RECORD["vs_baseline"] = round(r120["vox_per_s"] / 2.0e6, 2)
        extra["headline_geometry"] = "roi120 (like-for-like)"
    else:
        extra["inference_vox_per_s_roi120"] = None
        extra["roi120_error"] = err120

    # train legs BEFORE the roi-204 extra geometry: when the budget runs
    # short it is the optional leg that gets dropped, not the baseline
    # train comparison (r4 never reached the train legs at all)
    if os.environ.get("BENCH_TRAIN", "1") != "0":
        t148, errt = _run_leg(["--leg", "train", "--crop", "148", "--remat"],
                              leg_timeout)
        if t148:
            it148 = t148["it_per_s"]
            extra["train_iters_per_sec_148"] = round(it148, 3)
            extra["train_vs_baseline"] = round(it148 / 0.16, 2)
            extra["train_11k_wallclock_hours"] = round(11000 / it148 / 3600, 2)
        else:
            extra["train148_error"] = errt
        t108, errt = _run_leg(["--leg", "train", "--crop", "108"],
                              leg_timeout)
        if t108:
            extra["train_iters_per_sec_108"] = round(t108["it_per_s"], 3)
        else:
            extra["train108_error"] = errt

    r204 = None
    if os.environ.get("BENCH_FAST_ONLY", "0") != "1":
        # wp0 FIRST (VERDICT r4 weak #3): the XLA packed conv is the
        # hardware-proven roi-204 config (7.7 Mvox/s, round 2); the Pallas
        # W-pair kernel OOMed at this geometry in the r4 record, and its
        # fallback order burned ~13 min of compile before failing
        r204, err204 = inference([(tile_batch, False), (tile_batch, True)],
                                 204)
        if r204:
            extra["inference_vox_per_s_roi204"] = round(r204["vox_per_s"], 1)
            extra["wpallas"] = r204["wpallas"]
            if r204.get("fallback"):
                extra["fallback_roi204"] = r204["fallback"]
        else:
            extra["roi204_error"] = err204

    # never alias the roi-204 number into the like-for-like slot: if the
    # roi-120 leg did not run, say so in the JSON and flag the headline
    if not r120:
        if r204:
            _RECORD["value"] = round(r204["vox_per_s"], 1)
            _RECORD["vs_baseline"] = round(r204["vox_per_s"] / 2.0e6, 2)
            extra["headline_geometry"] = "roi204 (roi120 leg did not run)"
            extra["roi120_fallback"] = True
        else:
            extra["error"] = "all inference legs failed"

    extra["bench_elapsed_s"] = round(time.time() - _T0, 1)
    _emit()


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--leg", choices=["probe", "inference", "train"])
    ap.add_argument("--size", type=int, default=900)
    ap.add_argument("--tile-batch", type=int, default=1)
    ap.add_argument("--roi", type=int, default=120)
    ap.add_argument("--ov", type=int, default=15)
    ap.add_argument("--bc", type=int, default=10)
    ap.add_argument("--crop", type=int, default=148)
    ap.add_argument("--remat", action="store_true")
    a = ap.parse_args()
    if a.leg is None:
        try:
            main()
        except Exception as e:  # the record must ALWAYS hold a JSON line
            _RECORD["extra"]["error"] = f"{type(e).__name__}: {e}"
            _emit()
    elif a.leg == "probe":
        print(json.dumps(leg_probe()))
    elif a.leg == "inference":
        print(json.dumps(leg_inference(a.size, a.tile_batch, a.roi, a.ov,
                                       a.bc)))
    else:
        print(json.dumps(leg_train(a.crop, a.remat)))
