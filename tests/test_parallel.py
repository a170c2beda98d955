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


def test_mesh_helpers():
    from neuroclear_tpu.parallel.mesh import device_count, get_mesh

    n = device_count()
    assert n >= 1
    mesh = get_mesh(min(n, 2))
    assert mesh.axis_names == ("data",)
