"""Fast overlap-tile ("dice") inference engine — the TPU-native replacement
for the reference's sequential per-cube loop (test_dice.py:107-113 +
util/assemble_dice.py), per BASELINE config 5.

Design:
  * The raw (uint16) volume is padded for dicing, reflect-padded by
    border_cut, and uploaded to HBM ONCE.
  * A single jitted lax.scan streams tile batches: gather (dynamic_slice) ->
    normalize -> G forward -> border trim -> accumulate into an f32 output
    volume resident in HBM.  Two D2H transfers total (result + nothing else).
  * Overlap blending divides by the coverage count, which for an axis-aligned
    tile grid is a separable outer product of 1D counts — no mask volume.
    (The reference's cube/8 ... x8 guard is an exact f32 identity and is
    therefore elided.)
  * Optional flip-TTA (--repetition): each tile also runs flipped along each
    axis; outputs are unflipped and averaged (assemble_dice.py:79-128).
  * Multi-chip: tiles round-robin across a Mesh('data') via shard_map, each
    device accumulating locally, one psum at the end (ICI).

The x->y->z linear tile order contract (diceImage_dataset.py:99-106 ==
assemble_dice.py:60-77) is preserved via data.dicing.DiceGrid; since
accumulation is a sum, order does not affect the result.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dicing import DiceGrid


class DiceInferencePipeline:
    """precision: compute dtype for the generator ('bfloat16' is ~30% faster
    and halves activation HBM; accumulation always f32).
    out_dtype: when set (np.uint16/np.uint8) the final cast happens ON DEVICE
    and run() returns integers — 2-4x less device-to-host traffic.
    orig_shape: when set, the dicing pad is cropped off on device before the
    transfer."""

    def __init__(self, g_apply: Callable, params, grid: DiceGrid, inv_scale: float,
                 tile_batch: int = 4, repetition: bool = False,
                 n_devices: int = 1, precision: str = "float32",
                 out_dtype=None, orig_shape=None):
        self.g_apply = g_apply
        self.params = params
        self.grid = grid
        self.inv_scale = float(inv_scale)
        self.tile_batch = int(tile_batch)
        self.repetition = repetition
        self.n_devices = n_devices
        self.precision = precision
        self.out_dtype = out_dtype
        self.orig_shape = tuple(orig_shape) if orig_shape is not None else None

    def run(self, vol_padded: np.ndarray) -> np.ndarray:
        """vol_padded: dicing-padded (z, y, x) raw volume (NOT border-padded).
        Returns the assembled volume ([0,1] f32, or out_dtype integers)."""
        g = self.grid
        b = g.border_cut
        roi = g.roi_size
        ext = roi + 2 * b

        vol = jnp.asarray(vol_padded)
        if b > 0:
            vol = jnp.pad(vol, ((b, b), (b, b), (b, b)), mode="reflect")

        offsets = g.all_offsets()  # (N, 3) in dicing order
        n_tiles = len(offsets)
        B = self.tile_batch
        n_pad = (-n_tiles) % (B * self.n_devices)
        valid = np.concatenate([np.ones(n_tiles, np.float32),
                                np.zeros(n_pad, np.float32)])
        offs = np.concatenate([offsets, np.repeat(offsets[-1:], n_pad, 0)])

        acc = self._scan(vol, jnp.asarray(offs), jnp.asarray(valid),
                         vol_padded.shape, ext, roi, b, B)

        # separable coverage normalisation + optional crop/cast, one jit
        inv_cov = (jnp.asarray(1.0 / g.coverage_1d(g.z_steps)),
                   jnp.asarray(1.0 / g.coverage_1d(g.y_steps)),
                   jnp.asarray(1.0 / g.coverage_1d(g.x_steps)))
        out = _finalize(acc, inv_cov, self.orig_shape,
                        np.dtype(self.out_dtype).name if self.out_dtype else None)
        return np.asarray(out)

    # ------------------------------------------------------------------
    # streaming slab pipeline: z-major processing with a (roi, Y, X) slab
    # accumulator, per-slab emission (cast + coverage-normalised on device)
    # and async D2H overlapped with the next slab's compute.  Bounded HBM:
    # no full-volume f32 accumulator; volumes larger than HBM headroom work.

    def run_streaming(self, vol_padded: np.ndarray,
                      on_rows=None) -> np.ndarray:
        g = self.grid
        b, roi, step = g.border_cut, g.roi_size, g.step
        ext = roi + 2 * b
        Zp, Yp, Xp = vol_padded.shape

        # upload the RAW volume as per-slab z-chunks (contiguous views — no
        # host copy), issued async up front so host-to-device transfer
        # overlaps the earlier slabs' compute.  The border_cut reflect pad
        # is applied ON DEVICE per slab: z borders by stitching flipped
        # chunk edges, y/x by jnp.pad — the reference pads on the host
        # (diceImage_dataset.py:95-96), which costs a full-volume copy on
        # the critical path before any upload can start.
        vol_np = np.asarray(vol_padded)
        Zraw = vol_np.shape[0]
        if step >= ext - step and g.z_steps > 1 and step > b:
            chunks = []
            for i in range(g.z_steps):
                z0 = i * step
                z1 = (i + 1) * step if i < g.z_steps - 1 else Zraw
                chunks.append(jax.device_put(vol_np[z0:z1]))

            def slab_volume(i):
                # rows [i*step - b, i*step - b + ext) of the border-padded
                # volume, with reflection at the global z edges
                parts = []
                if i == 0:
                    if b > 0:  # reflect: rows b..1 of chunk 0
                        parts.append(jnp.flip(chunks[0][1:b + 1], 0))
                else:
                    parts.append(chunks[i - 1][step - b:])  # tail of prev
                parts.append(chunks[i])
                if i < g.z_steps - 1:
                    # head rows of the next chunk: ext-b-step = ov+b <= step
                    # under the guards, so one chunk always suffices
                    parts.append(chunks[i + 1][:ext - b - step])
                else:
                    if b > 0:  # reflect: last b rows mirrored
                        parts.append(jnp.flip(chunks[i][-b - 1:-1], 0))
                slab = parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)
                if b > 0:
                    slab = jnp.pad(slab, ((0, 0), (b, b), (b, b)),
                                   mode="reflect")
                return slab
        else:
            # extreme overlap (a slab spans >2 chunks): upload whole volume
            vol_bc = np.pad(vol_np, ((b, b), (b, b), (b, b)), mode="reflect") \
                if b > 0 else vol_np
            whole = jax.device_put(vol_bc)

            def slab_volume(i):
                return jax.lax.dynamic_slice_in_dim(whole, i * step, ext, 0)

        # per-slab (y, x) offsets in dicing order (x fastest)
        offs_yx = np.array([[y * step, x * step]
                            for y in range(g.y_steps)
                            for x in range(g.x_steps)], np.int32)
        n_slab = len(offs_yx)
        B = self.tile_batch
        nd = self.n_devices
        n_pad = (-n_slab) % (B * nd)
        valid = np.concatenate([np.ones(n_slab, np.float32),
                                np.zeros(n_pad, np.float32)])
        offs_yx = np.concatenate([offs_yx, np.repeat(offs_yx[-1:], n_pad, 0)])
        if nd > 1:  # round-robin tiles across devices
            offs_yx = offs_yx.reshape(-1, nd, 2).transpose(1, 0, 2)
            valid = valid.reshape(-1, nd).T
        offs_yx = jnp.asarray(offs_yx)
        valid = jnp.asarray(valid)

        inv_cz = 1.0 / g.coverage_1d(g.z_steps)
        inv_cy = jnp.asarray(1.0 / g.coverage_1d(g.y_steps))
        inv_cx = jnp.asarray(1.0 / g.coverage_1d(g.x_steps))
        out_dtype = np.dtype(self.out_dtype).name if self.out_dtype else None

        oz, oy, ox = self.orig_shape if self.orig_shape else (Zp, Yp, Xp)
        emitted = []
        acc = jnp.zeros((roi, Yp, Xp), jnp.float32)
        if nd == 1:
            slab_fn = _slab_step
        else:
            # built once per pipeline so repeated run_streaming calls reuse
            # the compiled sharded programs (the closure holds the jit cache)
            if getattr(self, "_sharded_slab_fn", None) is None:
                self._sharded_slab_fn = self._make_sharded_slab_step(nd)
            slab_fn = self._sharded_slab_fn
        for i in range(g.z_steps):
            row_inv = jnp.asarray(inv_cz[i * step:i * step + roi])
            # emit only the rows this slab contributes to the final volume
            # (the overlap tail rolls into the next slab), flattened to 1-D:
            # both cut device-to-host bytes/time on transfer-limited links
            take = roi if i == g.z_steps - 1 else step
            acc, emit = slab_fn(
                self.g_apply, self.params, slab_volume(i), acc, jnp.int32(0),
                offs_yx, valid, (row_inv, inv_cy, inv_cx), Yp, Xp, ext, roi,
                step, b, B, self.inv_scale, self.repetition, self.precision,
                out_dtype, oy, ox, take)
            try:
                emit.copy_to_host_async()
            except Exception:
                pass
            emitted.append((emit, take))

        # Harvest in z order, clipping the final slab's overhang to oz.
        # on_rows sees each block as soon as its transfer lands, so callers
        # (test_dice --save_volume) encode the output TIFF during the
        # device-to-host tail instead of after it.
        rows, z_done = [], 0
        for e, take in emitted:
            r = np.asarray(e).reshape(take, oy, ox)[:max(0, oz - z_done)]
            if r.shape[0]:
                if on_rows is not None:
                    on_rows(r)
                rows.append(r)
                z_done += r.shape[0]
        return np.concatenate(rows, axis=0)

    # ------------------------------------------------------------------

    def _make_sharded_slab_step(self, nd: int):
        """Multi-chip streaming: each device runs its round-robin share of
        the slab's tiles into a zero local delta; one psum over ICI merges
        deltas before the (replicated) emit/roll."""
        from jax.sharding import PartitionSpec as P
        from jax.experimental.shard_map import shard_map

        from .mesh import get_mesh

        mesh = get_mesh(nd)
        cache = {}

        def step(g_apply, params, vol, acc, z0, offs_yx, valid, inv_cov,
                 Yp, Xp, ext, roi, step_, b, B, inv_scale, repetition,
                 precision, out_dtype, oy, ox, take):
            # build + jit the sharded fns once (keyed on the static config)
            key = (Yp, Xp, ext, roi, step_, b, B, inv_scale, repetition,
                   precision, out_dtype, oy, ox, take)
            if key not in cache:
                @functools.partial(
                    shard_map, mesh=mesh,
                    in_specs=(P(), P(), P(), P("data"), P("data")),
                    out_specs=P(),
                )
                def accumulate(vol_, params_, z0_, offs_, valid_):
                    zero = jnp.zeros((roi, Yp, Xp), jnp.float32)
                    zero = jax.lax.pcast(zero, ("data",), to="varying")
                    delta = _slab_accumulate(g_apply, params_, vol_, zero, z0_,
                                             offs_[0], valid_[0], ext, roi, b,
                                             B, inv_scale, repetition,
                                             precision)
                    return jax.lax.psum(delta, "data")

                @jax.jit
                def finish(acc, delta, row_inv, inv_cy, inv_cx):
                    acc = acc + delta
                    emit = _emit_rows(acc, row_inv, inv_cy, inv_cx,
                                      out_dtype, oy, ox, take)
                    tail = acc[step_:]
                    new_acc = jnp.zeros_like(acc)
                    new_acc = jax.lax.dynamic_update_slice(new_acc, tail,
                                                           (0, 0, 0))
                    return new_acc, emit

                cache[key] = (jax.jit(accumulate), finish)

            acc_fn, finish_fn = cache[key]
            row_inv, inv_cy, inv_cx = inv_cov
            delta = acc_fn(vol, params, z0, offs_yx, valid)
            return finish_fn(acc, delta, row_inv, inv_cy, inv_cx)

        return step

    def _scan(self, vol, offs, valid, out_shape, ext, roi, b, B):
        if self.n_devices > 1:
            return self._scan_sharded(vol, offs, valid, out_shape, ext, roi, b, B)
        return _dice_scan(self.g_apply, self.params, vol, offs, valid,
                          out_shape, ext, roi, b, B, self.inv_scale,
                          self.repetition, precision=self.precision)

    def _scan_sharded(self, vol, offs, valid, out_shape, ext, roi, b, B):
        from jax.sharding import PartitionSpec as P
        from jax.experimental.shard_map import shard_map

        from .mesh import get_mesh

        mesh = get_mesh(self.n_devices)
        nd = self.n_devices
        # round-robin tiles across devices: (N,3) -> (nd, N/nd, 3)
        offs_d = offs.reshape(-1, nd, 3).transpose(1, 0, 2)
        valid_d = valid.reshape(-1, nd).T

        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(), P("data"), P("data")),
            out_specs=P(),
        )
        def run(vol_, offs_, valid_):
            acc0 = jnp.zeros(out_shape, jnp.float32)
            acc0 = jax.lax.pcast(acc0, ("data",), to="varying")
            local = _dice_scan(self.g_apply, self.params, vol_, offs_[0],
                               valid_[0], out_shape, ext, roi, b, B,
                               self.inv_scale, self.repetition,
                               precision=self.precision, acc0=acc0)
            return jax.lax.psum(local, "data")

        return jax.jit(run)(vol, offs_d, valid_d)


@functools.partial(
    jax.jit,
    static_argnames=("g_apply", "out_shape", "ext", "roi", "b", "B",
                     "inv_scale", "repetition", "precision"),
)
def _dice_scan(g_apply, params, vol, offs, valid, out_shape, ext, roi, b, B,
               inv_scale, repetition, precision="float32", acc0=None):
    n_batches = offs.shape[0] // B
    offs = offs.reshape(n_batches, B, 3)
    valid = valid.reshape(n_batches, B)
    compute_dtype = jnp.bfloat16 if precision == "bfloat16" else jnp.float32

    def gather_tile(off):
        return jax.lax.dynamic_slice(vol, (off[0], off[1], off[2]),
                                     (ext, ext, ext))

    def body(acc, inp):
        off_b, valid_b = inp
        tiles = (jax.vmap(gather_tile)(off_b).astype(jnp.float32)
                 * inv_scale).astype(compute_dtype)
        x = tiles[..., None]
        if repetition:
            variants = [x, x[:, ::-1], x[:, :, ::-1], x[:, :, :, ::-1]]
            y = g_apply(params, jnp.concatenate(variants, axis=0))
            y0, yz, yy, yx = jnp.split(y, 4, axis=0)
            y = (y0 + yz[:, ::-1] + yy[:, :, ::-1] + yx[:, :, :, ::-1]) * 0.25
        else:
            y = g_apply(params, x)
        y = y[..., 0].astype(jnp.float32)
        if b > 0:
            y = y[:, b:-b, b:-b, b:-b]
        y = y * valid_b[:, None, None, None]

        def add_one(acc, i):
            off = off_b[i]
            cur = jax.lax.dynamic_slice(acc, (off[0], off[1], off[2]),
                                        (roi, roi, roi))
            return jax.lax.dynamic_update_slice(acc, cur + y[i],
                                                (off[0], off[1], off[2]))

        for i in range(B):
            acc = add_one(acc, i)
        return acc, None

    if acc0 is None:
        acc0 = jnp.zeros(out_shape, jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, (offs, valid))
    return acc


@functools.partial(jax.jit, static_argnames=("orig_shape", "out_dtype"))
def _finalize(acc, inv_cov, orig_shape, out_dtype):
    icz, icy, icx = inv_cov
    out = acc * icz[:, None, None] * icy[None, :, None] * icx[None, None, :]
    if orig_shape is not None:
        oz, oy, ox = orig_shape
        out = out[:oz, :oy, :ox]
    if out_dtype == "uint16":
        out = jnp.clip(out, 0.0, 1.0) * (2 ** 16 - 1)
        out = out.astype(jnp.uint16)
    elif out_dtype == "uint8":
        out = jnp.clip(out, 0.0, 1.0) * 255.0
        out = out.astype(jnp.uint8)
    return out


def _slab_accumulate(g_apply, params, vol, acc, z0, offs_yx, valid, ext, roi,
                     b, B, inv_scale, repetition, precision):
    """Scan this slab's tile batches through G and accumulate into acc."""
    n_batches = offs_yx.shape[0] // B
    offs_b = offs_yx.reshape(n_batches, B, 2)
    valid_b = valid.reshape(n_batches, B)
    compute_dtype = jnp.bfloat16 if precision == "bfloat16" else jnp.float32

    def gather_tile(off):
        return jax.lax.dynamic_slice(vol, (z0, off[0], off[1]),
                                     (ext, ext, ext))

    def body(acc, inp):
        ob, vb = inp
        tiles = (jax.vmap(gather_tile)(ob).astype(jnp.float32)
                 * inv_scale).astype(compute_dtype)
        x = tiles[..., None]
        if repetition:
            variants = [x, x[:, ::-1], x[:, :, ::-1], x[:, :, :, ::-1]]
            y = g_apply(params, jnp.concatenate(variants, axis=0))
            y0, yz, yy, yx = jnp.split(y, 4, axis=0)
            y = (y0 + yz[:, ::-1] + yy[:, :, ::-1] + yx[:, :, :, ::-1]) * 0.25
        else:
            y = g_apply(params, x)
        y = y[..., 0].astype(jnp.float32)
        if b > 0:
            y = y[:, b:-b, b:-b, b:-b]
        y = y * vb[:, None, None, None]

        def add_one(acc, i):
            off = ob[i]
            cur = jax.lax.dynamic_slice(acc, (0, off[0], off[1]),
                                        (roi, roi, roi))
            return jax.lax.dynamic_update_slice(acc, cur + y[i],
                                                (0, off[0], off[1]))

        for i in range(B):
            acc = add_one(acc, i)
        return acc, None

    acc, _ = jax.lax.scan(body, acc, (offs_b, valid_b))
    return acc


@functools.partial(
    jax.jit,
    static_argnames=("g_apply", "Yp", "Xp", "ext", "roi", "step", "b", "B",
                     "inv_scale", "repetition", "precision", "out_dtype",
                     "oy", "ox", "take"),
)
def _slab_step(g_apply, params, vol, acc, z0, offs_yx, valid, inv_cov,
               Yp, Xp, ext, roi, step, b, B, inv_scale, repetition, precision,
               out_dtype, oy, ox, take):
    """Process one z-slab of tiles into the (roi, Yp, Xp) accumulator, then
    emit the normalised/cast rows and roll the overlap tail forward."""
    row_inv, inv_cy, inv_cx = inv_cov
    acc = _slab_accumulate(g_apply, params, vol, acc, z0, offs_yx, valid,
                           ext, roi, b, B, inv_scale, repetition, precision)
    emit = _emit_rows(acc, row_inv, inv_cy, inv_cx, out_dtype, oy, ox, take)

    # roll: tail rows [step, roi) seed the next slab; rest zero
    tail = acc[step:]
    new_acc = jnp.zeros_like(acc)
    new_acc = jax.lax.dynamic_update_slice(new_acc, tail, (0, 0, 0))
    return new_acc, emit


def _emit_rows(acc, row_inv, inv_cy, inv_cx, out_dtype, oy, ox, take):
    """Coverage-normalise, crop, cast, and FLATTEN the first `take` rows of
    the slab accumulator.  `take` = step except on the final slab (= roi):
    the overlap tail is not emitted — it rolls into the next slab — which
    saves roi/step x device-to-host bytes.  The 1-D emission avoids a slow
    strided-download path seen on remote-attached devices (~20% faster than
    3-D transfers of the same bytes, measured)."""
    emit = acc[:take] * row_inv[:take, None, None]
    emit = emit * inv_cy[None, :, None] * inv_cx[None, None, :]
    emit = emit[:, :oy, :ox]
    if out_dtype == "uint16":
        emit = (jnp.clip(emit, 0.0, 1.0) * (2 ** 16 - 1)).astype(jnp.uint16)
    elif out_dtype == "uint8":
        emit = (jnp.clip(emit, 0.0, 1.0) * 255.0).astype(jnp.uint8)
    return emit.reshape(-1)
