"""Data-parallel training over a virtual device mesh (tiny nets)."""

import argparse

import numpy as np
import pytest

import jax


def _opt(**kw):
    base = dict(
        isTrain=True, image_dimension=3, checkpoints_dir="/tmp/test_ck",
        name="dp", gpu_ids=[], input_nc=1, output_nc=1, ngf=8, ndf=8,
        netG="linearkernel", netG_B="linearkernel", netD="pixel",
        n_layers_D=3, norm="instance", init_type="normal", init_gain=0.02,
        no_dropout=True, gan_mode="lsgan", lambda_A=5.0, lambda_plane=[1, 1, 1],
        randomize_projection_depth=True, projection_depth=4,
        min_projection_depth=2, beta1=0.1, lr=1e-3, direction="AtoB",
        lr_policy="constant", n_epochs=10, n_epochs_decay=10, epoch_count=1,
        lr_decay_iters=5, continue_train=False, load_iter=0, epoch="latest",
        verbose=False, seed=0, model="axial_to_lateral_gan_apollo")
    base.update(kw)
    return argparse.Namespace(**base)


def test_data_parallel_apollo_step():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from neuroclear_tpu.models.axial_to_lateral_gan_apollo_model import (
        AxialToLateralGANApolloModel)
    from neuroclear_tpu.parallel.train_parallel import DataParallel

    opt = _opt()
    m = AxialToLateralGANApolloModel(opt)
    m.setup(opt)
    dp = DataParallel(m, n_devices=4)
    crops = [np.random.default_rng(i).random((1, 12, 12, 12, 1)).astype(np.float32)
             for i in range(dp.n)]
    m.set_input({"A": dp.shard(dp.stack(crops)), "A_paths": "x"})
    for _ in range(2):
        m.optimize_parameters()
    losses = m.get_current_losses()
    assert all(np.isfinite(v) for v in losses.values()), losses
    # params stayed replicated (single value per leaf across devices)
    leaf = jax.tree_util.tree_leaves(m.params["G_A"])[0]
    assert leaf.sharding.is_fully_replicated


def test_batched_device_sampler(tmp_path):
    """batch_sampler draws n crops in one program, emitted 'data'-sharded,
    and each crop equals the single-sample path under the same key."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from neuroclear_tpu.data.singlevolume_dataset import SingleVolumeDataset
    from neuroclear_tpu.models.axial_to_lateral_gan_apollo_model import (
        AxialToLateralGANApolloModel)
    from neuroclear_tpu.ops.augment import fused_augment
    from neuroclear_tpu.parallel.train_parallel import DataParallel
    from neuroclear_tpu.utils import tiffio

    rng = np.random.default_rng(3)
    tiffio.imwrite(str(tmp_path / "v.tif"),
                   rng.integers(0, 65535, (32, 32, 32), dtype=np.uint16))
    opt = _opt(dataroot=str(tmp_path), crop_size=[12, 12, 12],
               load_size=[0, 0, 0], no_flip=False,
               max_dataset_size=float("inf"),
               preprocess="random3Drotate_randomcrop_randomflip"
                          "_addColorChannel_addBatchChannel")
    ds = SingleVolumeDataset(opt)
    assert ds.supports_device_sampling

    m = AxialToLateralGANApolloModel(opt)
    m.setup(opt)
    dp = DataParallel(m, n_devices=4)
    sampler = dp.batch_sampler(ds)

    key = jax.random.PRNGKey(7)
    batch = sampler(key)
    assert batch.shape == (4, 12, 12, 12, 1)
    assert batch.dtype == np.float32
    # sharded over 'data': each device holds exactly one crop
    assert not batch.sharding.is_fully_replicated
    assert batch.sharding.shard_shape(batch.shape)[0] == 1

    # per-crop parity with the single-device path
    cfg = ds.device_sampling_config()
    keys = jax.random.split(key, 4)
    for i in range(4):
        single = fused_augment(keys[i], ds.device_volume(), **cfg)
        np.testing.assert_allclose(np.asarray(batch[i, ..., 0]),
                                   np.asarray(single), rtol=0, atol=1e-6)

    # and the batch drives a full DP train step
    m.set_input({"A": batch, "A_paths": "x"})
    m.optimize_parameters()
    losses = m.get_current_losses()
    assert all(np.isfinite(v) for v in losses.values()), losses


def test_dp_step_matches_single_device_batched_step():
    """The mesh-sharded SPMD step computes the same gradients (and losses)
    as the single-device batched step — same params, same rng, same crops;
    the only difference is the partitioner's psum reduction order (~1e-6).
    Chained with tests/test_grad_accum.py (accum == batched gradients) this
    certifies the <2h training story: a 1-chip --grad_accum N run feeds
    Adam the same gradients an N-chip DP run would.  (Parameter-bitwise
    comparison *through Adam* is deliberately not asserted: the step-1
    update is sign-like, g/sqrt(g^2), so elements with |g| ~ reduction
    noise legitimately flip — true of any DP system, torch included.)"""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from neuroclear_tpu.models import gan_common as gc
    from neuroclear_tpu.models.axial_to_lateral_gan_apollo_model import (
        AxialToLateralGANApolloModel, make_apollo_step)
    from neuroclear_tpu.parallel.mesh import get_mesh

    opt = _opt()
    m = AxialToLateralGANApolloModel(opt)
    g_params = {k: m.params[k] for k in ("G_A", "G_B")}
    d_params = {k: m.params[k] for k in m.model_names[2:]}
    optim = optax.identity()  # lr 1.0 + identity => param delta == -grad
    ostate = {"G": optim.init(g_params), "D": optim.init(d_params)}
    cfg = gc.GanStepConfig(gan_mode="lsgan", lambda_A=5.0,
                           lambda_plane=(1, 1, 1),
                           randomize_projection_depth=True,
                           projection_depth=4, min_projection_depth=2,
                           beta1=0.1)
    step = make_apollo_step(m.nets, optim, cfg)

    batch = np.random.default_rng(9).random((4, 12, 12, 12, 1)).astype(
        np.float32)
    rng = jax.random.PRNGKey(5)
    lr = jax.numpy.float32(1.0)
    clone = lambda t: jax.tree.map(jax.numpy.array, t)

    g1, d1, _, l1, *_ = step(clone(g_params), clone(d_params), clone(ostate),
                             rng, jax.numpy.asarray(batch), lr)

    mesh = get_mesh(4)
    repl = NamedSharding(mesh, P())
    put = lambda t: jax.device_put(t, repl)
    xb = jax.device_put(jax.numpy.asarray(batch),
                        NamedSharding(mesh, P("data")))
    g2, d2, _, l2, *_ = step(put(clone(g_params)), put(clone(d_params)),
                             put(clone(ostate)), rng, xb, lr)
    assert not xb.sharding.is_fully_replicated  # really ran sharded

    for tree_a, tree_b in ((g1, g2), (d1, d2)):
        for a, b in zip(jax.tree_util.tree_leaves(tree_a),
                        jax.tree_util.tree_leaves(tree_b)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0, atol=2e-5)
    for k in l1:
        np.testing.assert_allclose(float(l1[k]), float(l2[k]),
                                   rtol=0, atol=2e-5)


def test_mesh_helpers():
    from neuroclear_tpu.parallel.mesh import device_count, get_mesh

    n = device_count()
    assert n >= 1
    mesh = get_mesh(min(n, 2))
    assert mesh.axis_names == ("data",)
