"""Break down 900^3 dice-inference wall-clock into H2D / compute / D2H.

The streaming pipeline (parallel/dice_infer.py run_streaming) overlaps
chunked host-to-device upload, slab compute, and async device-to-host
emission.  This script measures each leg in isolation so the next
optimisation target is chosen from data, not guesses:

  1. H2D: device_put of the padded volume's z-chunks, blocked at the end.
  2. compute: slab steps with inputs already device-resident, losses
     fetched only at the end (pure device time incl. dispatch).
  3. D2H: np.asarray of device-resident uint16 slabs.
  4. end-to-end run_streaming (the bench number's shape).

Usage:  python scripts/profile_inference.py [size] [roi] [ov] [bc]
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


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 900
    roi = int(sys.argv[2]) if len(sys.argv) > 2 else 204
    ov = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    bc = int(sys.argv[4]) if len(sys.argv) > 4 else 10

    from neuroclear_tpu.data.dicing import DiceGrid
    from neuroclear_tpu.nn import generators as G
    from neuroclear_tpu.parallel.dice_infer import DiceInferencePipeline
    from neuroclear_tpu.utils.imageops import pad_for_dicing

    rng = np.random.default_rng(0)
    vol = rng.integers(0, 65535, (size, size, size), dtype=np.uint16)
    vp = pad_for_dicing(vol, roi, ov)
    grid = DiceGrid(vp.shape, roi, ov, bc)
    step = grid.step
    ext = roi + 2 * bc
    print(f"# {size}^3 roi{roi}/ov{ov}/bc{bc}: padded {vp.shape}, "
          f"{grid.z_steps}x{grid.y_steps}x{grid.x_steps} tiles, ext {ext}",
          flush=True)

    g = G.UNetDeconv(1, 1, norm="instance")
    params = g.init(jax.random.PRNGKey(0), "kaiming", 0.02)
    pipe = DiceInferencePipeline(g.apply, params, grid, 1 / 65535.0,
                                 tile_batch=int(os.environ.get(
                                     "BENCH_TILE_BATCH", "1")),
                                 precision="bfloat16",
                                 out_dtype=np.uint16, orig_shape=vol.shape)

    # ---- leg 1: H2D of the border-padded volume's z-chunks
    vol_bc = np.pad(vp, ((bc, bc), (bc, bc), (bc, bc)), mode="reflect")
    nbytes = vol_bc.nbytes
    for trial in range(2):
        t0 = time.time()
        chunks = []
        for i in range(grid.z_steps):
            z0 = i * step
            z1 = (i + 1) * step if i < grid.z_steps - 1 else vol_bc.shape[0]
            chunks.append(jax.device_put(np.ascontiguousarray(vol_bc[z0:z1])))
        for c in chunks:  # 1-element fetch = real landing barrier (see below)
            _ = np.asarray(c[-1:, -1:, -1:])
        dt = time.time() - t0
        print(f"# H2D trial{trial}: {nbytes/1e6:.0f} MB in {dt:.2f}s "
              f"-> {nbytes/dt/1e6:.0f} MB/s", flush=True)

    # ---- leg 2: pure compute, inputs device-resident
    from neuroclear_tpu.parallel.dice_infer import _slab_step

    offs_yx = np.array([[y * step, x * step]
                        for y in range(grid.y_steps)
                        for x in range(grid.x_steps)], np.int32)
    B = pipe.tile_batch
    n_pad = (-len(offs_yx)) % B
    valid = np.concatenate([np.ones(len(offs_yx), np.float32),
                            np.zeros(n_pad, np.float32)])
    offs_yx = np.concatenate([offs_yx, np.repeat(offs_yx[-1:], n_pad, 0)])
    offs_yx = jnp.asarray(offs_yx)
    valid = jnp.asarray(valid)
    inv_cz = 1.0 / grid.coverage_1d(grid.z_steps)
    inv_cy = jnp.asarray(1.0 / grid.coverage_1d(grid.y_steps))
    inv_cx = jnp.asarray(1.0 / grid.coverage_1d(grid.x_steps))
    Zp, Yp, Xp = vp.shape

    def slab_volume(i):
        if i == grid.z_steps - 1:
            return chunks[i]
        return jnp.concatenate([chunks[i], chunks[i + 1][:ext - step]], 0)

    for trial in range(2):
        t0 = time.time()
        acc = jnp.zeros((roi, Yp, Xp), jnp.float32)
        emitted = []
        for i in range(grid.z_steps):
            row_inv = jnp.asarray(inv_cz[i * step:i * step + roi])
            take = roi if i == grid.z_steps - 1 else step
            acc, emit = _slab_step(
                g.apply, params, slab_volume(i), acc, jnp.int32(0),
                offs_yx, valid, (row_inv, inv_cy, inv_cx), Yp, Xp, ext, roi,
                step, bc, B, 1 / 65535.0, False, "bfloat16", "uint16",
                size, size, take)
            emitted.append(emit)
        # block_until_ready can return before the device is done on the
        # axon tunnel (verify SKILL.md) — a 1-element fetch per slab is a
        # real dependency barrier and only moves 2 bytes each
        for e in emitted:
            _ = np.asarray(e[-1:])
        dt = time.time() - t0
        print(f"# compute trial{trial} ({'compile+' if trial == 0 else ''}"
              f"run): {dt:.2f}s", flush=True)

    # ---- leg 3: D2H of the emitted uint16 slabs
    out_bytes = sum(int(np.prod(e.shape)) * 2 for e in emitted)
    t0 = time.time()
    host = [np.asarray(e) for e in emitted]
    dt = time.time() - t0
    print(f"# D2H: {out_bytes/1e6:.0f} MB in {dt:.2f}s "
          f"-> {out_bytes/dt/1e6:.0f} MB/s", flush=True)
    del host, emitted, chunks, acc

    # ---- leg 3b: duplex — H2D issued async while D2H drains, to see
    # whether the link serialises directions (decides if overlapping the
    # next volume's upload with this one's download is worth anything)
    dev_out = [jax.device_put(np.zeros((step, size, size), np.uint16))
               for _ in range(grid.z_steps)]
    for d in dev_out:
        d.block_until_ready()
    t0 = time.time()
    up = []
    for i in range(grid.z_steps):
        z0 = i * step
        z1 = (i + 1) * step if i < grid.z_steps - 1 else vol_bc.shape[0]
        up.append(jax.device_put(np.ascontiguousarray(vol_bc[z0:z1])))
    host = [np.asarray(d) for d in dev_out]
    for c in up:
        c.block_until_ready()
    dt = time.time() - t0
    tot = nbytes + sum(h.nbytes for h in host)
    print(f"# duplex H2D+D2H: {tot/1e6:.0f} MB total in {dt:.2f}s "
          f"-> {tot/dt/1e6:.0f} MB/s aggregate", flush=True)
    del dev_out, up, host

    # ---- leg 4: end-to-end (steady)
    out = pipe.run_streaming(vp)
    t0 = time.time()
    out = pipe.run_streaming(vp)
    dt = time.time() - t0
    print(f"# end-to-end steady: {dt:.2f}s -> "
          f"{size**3/dt/1e6:.1f} Mvoxel/s", flush=True)
    del out


if __name__ == "__main__":
    main()
