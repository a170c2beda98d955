"""--grad_accum N must be the exact math of the batch-N data-parallel step.

The <2 h / 11k-iteration training claim rests on this equivalence: a 1-chip
run with --grad_accum 8 walks the same parameter trajectory as an 8-chip DP
run (same crops, same probe keys, mean-of-per-sample grads, one Adam update),
so single-chip quality evidence certifies the multi-chip recipe.
"""

import argparse

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _opt(**kw):
    base = dict(
        isTrain=True, image_dimension=3, checkpoints_dir="/tmp/test_ck",
        name="ga", gpu_ids=[], input_nc=1, output_nc=1, ngf=8, ndf=8,
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


def _cfg(**kw):
    from neuroclear_tpu.models import gan_common as gc

    base = dict(gan_mode="lsgan", lambda_A=5.0, lambda_plane=(1, 1, 1),
                randomize_projection_depth=True, projection_depth=4,
                min_projection_depth=2, beta1=0.1, precision="float32",
                remat=False)
    base.update(kw)
    return gc.GanStepConfig(**base)


@pytest.mark.parametrize("accum_host", [False, True],
                         ids=["fused-scan", "host-microbatch"])
def test_grad_accum_matches_batched_gradients(accum_host):
    """identity optimizer + lr 1.0 => param delta == -averaged gradient, so
    comparing updated params compares raw gradients (no Adam sign noise).
    Covers BOTH accumulation executions: the fused lax.scan program and the
    production host-microbatch dispatch loop (the 16 GB-v5e-safe form)."""
    import optax

    from neuroclear_tpu.models.axial_to_lateral_gan_apollo_model import (
        AxialToLateralGANApolloModel, make_apollo_step)

    opt = _opt()
    m = AxialToLateralGANApolloModel(opt)
    g_params = {k: m.params[k] for k in ("G_A", "G_B")}
    d_params = {k: m.params[k] for k in m.model_names[2:]}
    optim = optax.identity()
    ostate = {"G": optim.init(g_params), "D": optim.init(d_params)}

    step_batched = make_apollo_step(m.nets, optim, _cfg(grad_accum=1))
    step_accum = make_apollo_step(
        m.nets, optim, _cfg(grad_accum=4, accum_host=accum_host))

    real = jnp.asarray(np.random.default_rng(0).random(
        (4, 12, 12, 12, 1)).astype(np.float32))
    rng = jax.random.PRNGKey(11)
    lr = jnp.float32(1.0)

    def clone(t):
        return jax.tree.map(jnp.array, t)

    g1, d1, _, l1, f1, r1 = step_batched(
        clone(g_params), clone(d_params), clone(ostate), rng, real, lr)
    g4, d4, _, l4, f4, r4 = step_accum(
        clone(g_params), clone(d_params), clone(ostate), rng, real, lr)

    for tree_a, tree_b in ((g1, g4), (d1, d4)):
        for a, b in zip(jax.tree_util.tree_leaves(tree_a),
                        jax.tree_util.tree_leaves(tree_b)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0, atol=3e-5)
    for k in l1:
        np.testing.assert_allclose(float(l1[k]), float(l4[k]),
                                   rtol=0, atol=3e-5)
    # accum path carries only the LAST microbatch's fake/rec for visuals
    # (stacking all N OOMed beside the 148^3 remat footprint on hardware)
    np.testing.assert_allclose(np.asarray(f1)[-1:], np.asarray(f4),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(r1)[-1:], np.asarray(r4),
                               rtol=0, atol=1e-5)


def test_grad_accum_athena_matches_batched_gradients():
    """same equivalence for the athena step (no per-step rng, 6 Ds)."""
    import optax

    from neuroclear_tpu.models.axial_to_lateral_gan_athena_model import (
        AxialToLateralGANAthenaModel, make_athena_step)

    opt = _opt(model="axial_to_lateral_gan_athena",
               conversion_plane=["yz", "xy"])
    m = AxialToLateralGANAthenaModel(opt)
    g_params = {k: m.params[k] for k in ("G_A", "G_B")}
    d_params = {k: m.params[k] for k in m.model_names[2:]}
    optim = optax.identity()
    ostate = {"G": optim.init(g_params), "D": optim.init(d_params)}
    axes = (m.target_axis, m.source_axis, m.remain_axis)

    step1 = make_athena_step(m.nets, optim, _cfg(grad_accum=1,
                             randomize_projection_depth=False), axes)
    step3 = make_athena_step(m.nets, optim, _cfg(grad_accum=3,
                             randomize_projection_depth=False), axes)

    real = jnp.asarray(np.random.default_rng(1).random(
        (3, 10, 10, 10, 1)).astype(np.float32))
    lr = jnp.float32(1.0)
    clone = lambda t: jax.tree.map(jnp.array, t)

    g1, d1, _, l1, *_ = step1(clone(g_params), clone(d_params), clone(ostate),
                              real, lr)
    g3, d3, _, l3, *_ = step3(clone(g_params), clone(d_params), clone(ostate),
                              real, lr)
    for tree_a, tree_b in ((g1, g3), (d1, d3)):
        for a, b in zip(jax.tree_util.tree_leaves(tree_a),
                        jax.tree_util.tree_leaves(tree_b)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0, atol=3e-5)
    for k in l1:
        np.testing.assert_allclose(float(l1[k]), float(l3[k]),
                                   rtol=0, atol=3e-5)


def test_grad_accum_dryops_matches_batched_gradients():
    """same equivalence for the dryops ablation (single G, no cycle)."""
    import optax

    from neuroclear_tpu.models.axial_to_lateral_gan_dryops_model import (
        AxialToLateralGANDryopsModel, make_dryops_step)

    opt = _opt(model="axial_to_lateral_gan_dryops")
    m = AxialToLateralGANDryopsModel(opt)
    g_params = {"G_A": m.params["G_A"]}
    d_params = {k: m.params[k] for k in ("D_A_lateral", "D_A_axial")}
    optim = optax.identity()
    ostate = {"G": optim.init(g_params), "D": optim.init(d_params)}

    step1 = make_dryops_step(m.nets, optim, _cfg(grad_accum=1))
    step3 = make_dryops_step(m.nets, optim, _cfg(grad_accum=3))

    real = jnp.asarray(np.random.default_rng(2).random(
        (3, 10, 10, 10, 1)).astype(np.float32))
    rng = jax.random.PRNGKey(4)
    lr = jnp.float32(1.0)
    clone = lambda t: jax.tree.map(jnp.array, t)

    g1, d1, _, l1, _ = step1(clone(g_params), clone(d_params), clone(ostate),
                             rng, real, lr)
    g3, d3, _, l3, _ = step3(clone(g_params), clone(d_params), clone(ostate),
                             rng, real, lr)
    for tree_a, tree_b in ((g1, g3), (d1, d3)):
        for a, b in zip(jax.tree_util.tree_leaves(tree_a),
                        jax.tree_util.tree_leaves(tree_b)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0, atol=3e-5)
    for k in l1:
        np.testing.assert_allclose(float(l1[k]), float(l3[k]),
                                   rtol=0, atol=3e-5)


def test_sample_batch_matches_dp_sampler_keys(tmp_path):
    """dataset.sample_batch splits the rng exactly like the DP batch sampler,
    so the accum run consumes the same crops an N-chip DP run would."""
    from neuroclear_tpu.data.singlevolume_dataset import SingleVolumeDataset
    from neuroclear_tpu.ops.augment import fused_augment
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

    key = jax.random.PRNGKey(7)
    batch = ds.sample_batch(key, 3)
    assert batch.shape == (3, 12, 12, 12, 1)

    cfg = ds.device_sampling_config()
    keys = jax.random.split(key, 3)
    for i in range(3):
        single = fused_augment(keys[i], ds.device_volume(), **cfg)
        # 1e-5: the vmapped chain fuses the trilinear lerp differently from
        # the single-crop program (float reassociation), unlike the sharded
        # DP sampler which runs the single-crop program per device
        np.testing.assert_allclose(np.asarray(batch[i, ..., 0]),
                                   np.asarray(single), rtol=0, atol=1e-5)


def test_grad_accum_cli_smoke(tmp_path):
    """model-level driver: grad_accum config produces finite losses and
    updated params through the public optimize_parameters API."""
    from neuroclear_tpu.data.singlevolume_dataset import SingleVolumeDataset
    from neuroclear_tpu.models.axial_to_lateral_gan_apollo_model import (
        AxialToLateralGANApolloModel)
    from neuroclear_tpu.utils import tiffio

    rng = np.random.default_rng(5)
    tiffio.imwrite(str(tmp_path / "v.tif"),
                   rng.integers(0, 65535, (32, 32, 32), dtype=np.uint16))
    opt = _opt(dataroot=str(tmp_path), crop_size=[12, 12, 12],
               load_size=[0, 0, 0], no_flip=False,
               max_dataset_size=float("inf"), grad_accum=2,
               preprocess="random3Drotate_randomcrop_randomflip"
                          "_addColorChannel_addBatchChannel")
    ds = SingleVolumeDataset(opt)
    m = AxialToLateralGANApolloModel(opt)
    m.setup(opt)
    before = np.asarray(jax.tree_util.tree_leaves(m.params["G_A"])[0]).copy()
    for i in range(2):
        m.set_input({"A": ds.sample_batch(m.next_rng(), 2), "A_paths": "x"})
        m.optimize_parameters()
    losses = m.get_current_losses()
    assert all(np.isfinite(v) for v in losses.values()), losses
    after = np.asarray(jax.tree_util.tree_leaves(m.params["G_A"])[0])
    assert not np.allclose(before, after)
