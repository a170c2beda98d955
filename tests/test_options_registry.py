"""Options two-pass parsing with dynamic flag injection; registries;
schedulers; checkpoint flatten/unflatten; imageops."""

import numpy as np

import jax.numpy as jnp

from neuroclear_tpu.nn.core import flatten_params, unflatten_params
from neuroclear_tpu.nn.schedulers import LRController
from neuroclear_tpu.options.test_options import TestOptions
from neuroclear_tpu.options.train_options import TrainOptions
from neuroclear_tpu.utils import imageops


def test_train_options_inject_model_and_dataset_flags(tmp_path):
    argv = ["--dataroot", str(tmp_path), "--model", "axial_to_lateral_gan_apollo",
            "--dataset_mode", "singlevolume", "--checkpoints_dir", str(tmp_path),
            "--lambda_A", "5", "--lambda_plane", "1", "1", "1",
            "--crop_size", "64", "64", "64", "--randomize_projection_depth",
            "--gan_mode", "lsgan", "--lr_policy", "constant"]
    opt = TrainOptions().parse(argv)
    assert opt.lambda_A == 5.0
    assert opt.lambda_plane == [1, 1, 1]
    assert opt.randomize_projection_depth is True
    assert opt.netG_B == "deep_linear_gen"  # apollo-injected default
    assert opt.no_dropout is True  # apollo set_defaults
    assert opt.isTrain is True
    assert (tmp_path / opt.name / "train_opt.txt").exists()


def test_test_options_inject_dice_flags(tmp_path):
    argv = ["--dataroot", str(tmp_path), "--dataset_mode", "diceImage",
            "--results_dir", str(tmp_path), "--overlap", "15",
            "--border_cut", "10", "--dice_size", "120", "120", "120",
            "--model_suffix", "_A", "--skip_real"]
    opt = TestOptions().parse(argv)
    assert opt.model == "test"  # forced default
    assert opt.overlap == 15 and opt.border_cut == 10
    assert opt.model_suffix == "_A"
    assert opt.isTrain is False


def test_model_registry():
    from neuroclear_tpu.models import find_model_using_name

    for name in ["axial_to_lateral_gan_apollo", "axial_to_lateral_gan_athena",
                 "axial_to_lateral_gan_dryops", "test"]:
        assert find_model_using_name(name) is not None


def test_dataset_registry():
    from neuroclear_tpu.data import find_dataset_using_name

    for name in ["singlevolume", "cube", "diceImage", "simulationcrop"]:
        assert find_dataset_using_name(name) is not None


def test_lr_policies():
    import argparse

    base = dict(n_epochs=10, n_epochs_decay=10, epoch_count=1, lr_decay_iters=5)
    opt = argparse.Namespace(**base)
    c = LRController("constant", opt)
    for _ in range(20):
        c.step()
    assert c.scale == 1.0

    c = LRController("linear", opt)
    scales = [c.scale] + [c.step() for _ in range(20)]
    assert scales[0] == 1.0
    assert scales[-1] <= 0.1
    assert all(a >= b - 1e-9 for a, b in zip(scales, scales[1:]))

    c = LRController("step", opt)
    c.step(); c.step(); c.step(); c.step(); c.step()
    assert abs(c.scale - 0.1) < 1e-9

    c = LRController("cosine", opt)
    for _ in range(10):
        c.step()
    assert c.scale < 1e-9

    # plateau: torch ReduceLROnPlateau(min, factor=0.2, threshold=0.01,
    # patience=5) semantics — decays only after >5 non-improving steps
    c = LRController("plateau", opt)
    c.step(1.0)
    for _ in range(5):  # 5 bad epochs: still within patience
        c.step(1.0)
    assert c.scale == 1.0
    c.step(1.0)  # 6th bad epoch -> decay
    assert abs(c.scale - 0.2) < 1e-9
    c.step(0.5)  # improvement resets patience
    for _ in range(5):
        c.step(0.5)
    assert abs(c.scale - 0.2) < 1e-9


def test_lr_resume_continues_schedule():
    """Controller state round-trips through state()/restore(): resuming
    mid-linear-decay and mid-plateau continues the lr scale instead of
    resetting (the reference rebuilt schedulers from --epoch_count only,
    models/base_model.py:81-92)."""
    import argparse

    base = dict(n_epochs=10, n_epochs_decay=10, epoch_count=1, lr_decay_iters=5)
    opt = argparse.Namespace(**base)

    # linear: advance past the decay knee, snapshot, restore into a fresh one
    c = LRController("linear", opt)
    for _ in range(15):
        c.step()
    assert c.scale < 1.0
    fresh = LRController("linear", opt)
    assert fresh.scale == 1.0  # without restore, the position resets
    fresh.restore(c.state())
    assert fresh.scale == c.scale
    assert fresh.step() == c.step()  # and continues in lockstep

    # plateau: decay once, snapshot mid-patience, restore, keep counting
    c = LRController("plateau", opt)
    c.step(1.0)
    for _ in range(6):
        c.step(1.0)
    assert abs(c.scale - 0.2) < 1e-9
    c.step(1.0); c.step(1.0)  # 2 bad epochs into the next patience window
    fresh = LRController("plateau", opt)
    fresh.restore(c.state())
    assert abs(fresh.scale - 0.2) < 1e-9
    for f in (c, fresh):
        for _ in range(4):  # 4 more bad epochs -> 6 > patience -> decay
            f.step(1.0)
    assert abs(fresh.scale - 0.04) < 1e-9
    assert fresh.scale == c.scale


def test_lr_state_in_optim_checkpoint(tmp_path):
    """save_networks/load_networks persist and restore the lr position."""
    import argparse

    from neuroclear_tpu.models.axial_to_lateral_gan_dryops_model import (
        AxialToLateralGANDryopsModel)

    def mkopt(ck, cont=False):
        return argparse.Namespace(
            isTrain=True, image_dimension=3, checkpoints_dir=str(ck),
            name="lrck", gpu_ids=[], input_nc=1, output_nc=1, ngf=8, ndf=8,
            netG="linearkernel", netD="pixel", n_layers_D=3, norm="instance",
            init_type="normal", init_gain=0.02, no_dropout=True,
            gan_mode="lsgan", lambda_A=5.0, lambda_plane=[1, 1, 1],
            randomize_projection_depth=False, projection_depth=4,
            min_projection_depth=2, beta1=0.1, lr=1e-3, direction="AtoB",
            lr_policy="linear", n_epochs=5, n_epochs_decay=10, epoch_count=1,
            lr_decay_iters=5, continue_train=cont,
            load_iter=8 if cont else 0, epoch="latest", verbose=False, seed=0)

    opt = mkopt(tmp_path)
    m = AxialToLateralGANDryopsModel(opt)
    m.setup(opt)
    for _ in range(8):
        m.update_learning_rate()
    scale_before = m.lr_scale
    assert scale_before < 1.0
    m.save_networks("iter_8")

    opt2 = mkopt(tmp_path, cont=True)
    m2 = AxialToLateralGANDryopsModel(opt2)
    m2.setup(opt2)
    assert m2.lr_scale == scale_before


def test_param_flatten_roundtrip():
    tree = {"a": {"b": jnp.ones((2, 3)), "c": jnp.zeros((4,))},
            "d": jnp.full((5,), 2.0)}
    flat = flatten_params(tree)
    assert set(flat) == {"a.b", "a.c", "d"}
    back = unflatten_params(flat)
    np.testing.assert_array_equal(np.asarray(back["a"]["b"]), np.ones((2, 3)))
    np.testing.assert_array_equal(np.asarray(back["d"]), np.full((5,), 2.0))


def test_psnr_and_standardize():
    a = np.random.default_rng(0).integers(0, 255, (20, 20)).astype(np.uint8)
    assert imageops.get_psnr(a, a.astype(float) + 1, 255) > 40
    s = imageops.standardize(a.astype(float))
    assert abs(s.mean()) < 1e-9 and abs(s.std() - 1) < 1e-9


def test_match_histograms_maps_distribution():
    rng = np.random.default_rng(1)
    img = rng.normal(0, 1, (50, 50)).astype(np.float32)
    ref = rng.normal(10, 3, (50, 50)).astype(np.float32)
    out = imageops.match_histograms(img, ref)
    assert abs(out.mean() - ref.mean()) < 0.5
    assert abs(out.std() - ref.std()) < 0.5
    # monotonic: ordering preserved
    flat_in, flat_out = img.ravel(), out.ravel()
    order = np.argsort(flat_in)
    assert (np.diff(flat_out[order]) >= -1e-6).all()


def test_rescale_intensity():
    x = np.array([0.0, 1.0, 2.0, 3.0], np.float32)
    out = imageops.rescale_intensity(x, (1.0, 3.0))
    np.testing.assert_allclose(out, [0, 0, 0.5, 1.0])


def test_tiffio_roundtrip(tmp_path):
    from neuroclear_tpu.utils import tiffio

    vol = np.random.default_rng(2).integers(0, 65535, (5, 16, 16)).astype(np.uint16)
    p = str(tmp_path / "vol.tif")
    tiffio.imwrite(p, vol)
    back = tiffio.imread(p)
    np.testing.assert_array_equal(back, vol)

    img8 = np.random.default_rng(3).integers(0, 255, (16, 16)).astype(np.uint8)
    p8 = str(tmp_path / "img.tif")
    tiffio.imwrite(p8, img8)
    np.testing.assert_array_equal(tiffio.imread(p8), img8)
