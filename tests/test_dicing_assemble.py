"""Dice grid index contract, pad math, assembly round-trips (host + device,
single- and multi-device, TTA)."""

import numpy as np
import pytest

from neuroclear_tpu.data.dicing import DiceCube, DiceGrid
from neuroclear_tpu.utils.imageops import pad_for_dicing


def test_pad_for_dicing_reference_formula():
    vol = np.zeros((100, 90, 80), np.uint16)
    out = pad_for_dicing(vol, 40, 10)
    step = 30
    for i, dim in enumerate((100, 90, 80)):
        counts = (dim + 10) // step
        assert out.shape[i] == step * counts + 40
    # stepping must tile exactly: (n - overlap) % step == 0
    for n in out.shape:
        assert (n - 10) % step == 0


def test_dice_grid_linear_order_x_then_y_then_z():
    g = DiceGrid((70, 70, 70), 40, 10)  # steps=2 per axis
    assert (g.z_steps, g.y_steps, g.x_steps) == (2, 2, 2)
    seq = [g.index_to_3d(i) for i in range(len(g))]
    # x fastest, then y, then z (diceImage_dataset.py:99-106)
    assert seq == [(0, 0, 0), (0, 0, 1), (0, 1, 0), (0, 1, 1),
                   (1, 0, 0), (1, 0, 1), (1, 1, 0), (1, 1, 1)]


def test_dice_cube_extraction_matches_direct_slicing():
    rng = np.random.default_rng(0)
    vol = rng.integers(0, 1000, (70, 70, 70)).astype(np.uint16)
    bc = 5
    cube = DiceCube(vol, 40, overlap=10, border_cut=bc)
    padded = np.pad(vol, bc, mode="reflect")
    for i in range(len(cube)):
        z, y, x = cube.grid.index_to_coordinates(i)
        expect = padded[z:z + 50, y:y + 50, x:x + 50]
        np.testing.assert_array_equal(cube[i], expect)


def test_coverage_1d_matches_tile_overlap():
    g = DiceGrid((70, 70, 70), 40, 10)
    cov = g.coverage_1d(g.z_steps)
    assert len(cov) == 70
    assert cov[0] == 1 and cov[35] == 2 and cov[-1] == 1  # overlap [30,40)
    assert (cov >= 1).all()


def _fake_opt(**kw):
    import argparse

    base = dict(dataset_mode="diceImage", border_cut=0, dice_size=[40, 40, 40],
                overlap=10, data_type="uint16", skip_real=False,
                histogram_match=False, normalize_intensity=False,
                sat_level=[0.25, 99.75])
    base.update(kw)
    return argparse.Namespace(**base)


class _FakeDataset:
    def __init__(self, orig, padded):
        self._o, self._p = orig, padded

    def size_original(self):
        return self._o

    def size(self):
        return self._p


def test_assemble_dice_identity_roundtrip():
    """assemble(dice(x)) == x for the identity 'network' (host path)."""
    from neuroclear_tpu.utils.assemble import Assemble_Dice

    rng = np.random.default_rng(1)
    vol = rng.random((70, 70, 70)).astype(np.float32)
    bc = 5
    cube = DiceCube(vol, 40, overlap=10, border_cut=bc)
    opt = _fake_opt(border_cut=bc)
    asm = Assemble_Dice(opt, dataset=_FakeDataset((60, 60, 60), vol.shape))
    for i in range(len(cube)):
        c = cube[i][None, ..., None]  # NDHWC
        asm.addToStack({"real": c, "fake": c})
    asm.assemble_all()
    out = asm.getDict()["fake"].astype(np.float32) / (2 ** 16 - 1)
    np.testing.assert_allclose(out, vol[:60, :60, :60], atol=2e-4)


def test_device_pipeline_identity_roundtrip():
    from neuroclear_tpu.parallel.dice_infer import DiceInferencePipeline

    rng = np.random.default_rng(2)
    vol = rng.integers(0, 65535, (50, 45, 40)).astype(np.uint16)
    vp = pad_for_dicing(vol, 20, 5)
    grid = DiceGrid(vp.shape, 20, 5, 3)
    ref = vp.astype(np.float32) / 65535.0
    ident = lambda params, x: x
    out = DiceInferencePipeline(ident, {}, grid, 1 / 65535.0, tile_batch=3).run(vp)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_streaming_pipeline_matches_batch_path():
    from neuroclear_tpu.parallel.dice_infer import DiceInferencePipeline

    rng = np.random.default_rng(5)
    vol = rng.integers(0, 65535, (50, 45, 40)).astype(np.uint16)
    vp = pad_for_dicing(vol, 20, 5)
    grid = DiceGrid(vp.shape, 20, 5, 3)
    ident = lambda params, x: x
    pipe = DiceInferencePipeline(ident, {}, grid, 1 / 65535.0, tile_batch=3,
                                 out_dtype=np.uint16, orig_shape=vol.shape)
    out_s = pipe.run_streaming(vp)
    out_b = np.asarray(pipe.run(vp))[:50, :45, :40]
    assert out_s.shape == vol.shape
    np.testing.assert_array_equal(out_s, out_b)


def test_streaming_pipeline_sharded():
    import jax

    from neuroclear_tpu.parallel.dice_infer import DiceInferencePipeline

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    rng = np.random.default_rng(6)
    vol = rng.integers(0, 65535, (50, 45, 40)).astype(np.uint16)
    vp = pad_for_dicing(vol, 20, 5)
    grid = DiceGrid(vp.shape, 20, 5, 3)
    ident = lambda params, x: x
    p1 = DiceInferencePipeline(ident, {}, grid, 1 / 65535.0, tile_batch=2,
                               out_dtype=np.uint16, orig_shape=vol.shape)
    p4 = DiceInferencePipeline(ident, {}, grid, 1 / 65535.0, tile_batch=2,
                               n_devices=4, out_dtype=np.uint16,
                               orig_shape=vol.shape)
    o1 = p1.run_streaming(vp)
    o4 = p4.run_streaming(vp)
    assert np.abs(o1.astype(int) - o4.astype(int)).max() <= 1  # psum ordering


def test_device_pipeline_sharded_and_tta():
    import jax

    from neuroclear_tpu.parallel.dice_infer import DiceInferencePipeline

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    rng = np.random.default_rng(3)
    vol = rng.integers(0, 65535, (30, 30, 30)).astype(np.uint16)
    vp = pad_for_dicing(vol, 16, 4)
    grid = DiceGrid(vp.shape, 16, 4, 2)
    ref = vp.astype(np.float32) / 65535.0
    ident = lambda params, x: x
    out = DiceInferencePipeline(ident, {}, grid, 1 / 65535.0, tile_batch=2,
                                n_devices=4).run(vp)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)
    out = DiceInferencePipeline(ident, {}, grid, 1 / 65535.0, tile_batch=2,
                                repetition=True).run(vp)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_streaming_on_rows_matches_return(tmp_path):
    """on_rows sees exactly the returned volume, in order, and feeding the
    blocks to StreamingTiffWriter reproduces imwrite byte-for-byte (the
    test_dice --save_volume overlap path)."""
    from neuroclear_tpu.parallel.dice_infer import DiceInferencePipeline
    from neuroclear_tpu.utils import tiffio

    rng = np.random.default_rng(11)
    vol = rng.integers(0, 65535, (50, 45, 40)).astype(np.uint16)
    vp = pad_for_dicing(vol, 20, 5)
    grid = DiceGrid(vp.shape, 20, 5, 3)
    ident = lambda params, x: x
    pipe = DiceInferencePipeline(ident, {}, grid, 1 / 65535.0, tile_batch=3,
                                 out_dtype=np.uint16, orig_shape=vol.shape)
    stream = str(tmp_path / "streamed.tif")
    ref = str(tmp_path / "ref.tif")
    with tiffio.StreamingTiffWriter(stream, vol.shape, np.uint16) as w:
        out = pipe.run_streaming(vp, on_rows=w.write_rows)
    assert out.shape == vol.shape
    tiffio.imwrite(ref, out)
    assert open(stream, "rb").read() == open(ref, "rb").read()
