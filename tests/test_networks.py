"""Network zoo: shapes + exact parameter-count parity with the reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neuroclear_tpu.nn import discriminators as D
from neuroclear_tpu.nn import generators as G
from neuroclear_tpu.nn.core import count_params
from neuroclear_tpu.nn.factory import define_D, define_G

KEY = jax.random.PRNGKey(0)


def test_unet_deconv_params_and_shape():
    g = G.UNetDeconv(1, 1, norm="instance")
    p = g.init(KEY, "kaiming", 0.02)
    assert count_params(p) == 7_077_251  # torch reference exact
    y = g.apply(p, jnp.zeros((1, 16, 16, 16, 1)))
    assert y.shape == (1, 16, 16, 16, 1)
    assert 0.0 <= float(jnp.min(y)) and float(jnp.max(y)) <= 1.0  # sigmoid head


def test_deep_linear_gen_params_and_linearity():
    g = G.DeepLinearGenerator(1, 1)
    p = g.init(KEY, "kaiming", 0.02)
    assert count_params(p) == 647_120  # torch reference exact
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 16, 16, 16, 1)),
                    jnp.float32)
    y1 = g.apply(p, x)
    y2 = g.apply(p, 2.0 * x)
    np.testing.assert_allclose(np.asarray(y2), 2 * np.asarray(y1), atol=1e-4)


def test_patchgan_params_and_shape():
    d = D.NLayerDiscriminator(1, 64, 3, "instance", dim=2)
    p = d.init(KEY, "kaiming", 0.02)
    assert count_params(p) == 2_762_689  # torch reference exact
    y = d.apply(p, jnp.zeros((2, 64, 64, 1)))
    assert y.shape == (2, 6, 6, 1)  # torch reference output size for 64^2


def test_unet_vanilla_runs():
    g = G.UNetVanilla(1, 1, norm="instance")
    p = g.init(KEY, "normal", 0.02)
    y = g.apply(p, jnp.zeros((1, 16, 16, 16, 1)))
    assert y.shape == (1, 16, 16, 16, 1)


@pytest.mark.parametrize("name", ["linearkernel", "linearkernel_double",
                                  "linearkernel_NC", "deep_linear_gen"])
def test_generator_factory_3d(name):
    g = define_G(1, 1, 64, name, "instance", dimension=3)
    p = g.init(KEY, "normal", 0.02)
    y = g.apply(p, jnp.zeros((1, 12, 12, 12, 1)))
    assert y.shape == (1, 12, 12, 12, 1)


def test_resnet_generator_2d():
    g = define_G(1, 1, 16, "resnet_6blocks", "instance", dimension=2)
    p = g.init(KEY, "normal", 0.02)
    y = g.apply(p, jnp.zeros((1, 32, 32, 1)))
    assert y.shape == (1, 32, 32, 1)


@pytest.mark.parametrize("name", ["basic", "basic_SN", "n_layers", "pixel",
                                  "kernelGAN"])
def test_discriminator_factory_2d(name):
    d = define_D(1, 16, name, n_layers_D=2, norm="instance", dimension=2)
    p = d.init(KEY, "normal", 0.02)
    y = d.apply(p, jnp.zeros((1, 48, 48, 1)))
    assert y.ndim == 4 and y.shape[0] == 1 and y.shape[-1] == 1


def test_fixed_kernel_psf():
    psf = np.zeros((3, 3, 3), np.float32)
    psf[1, 1, 1] = 1.0  # identity PSF
    g = G.FixedLinearKernel((3, 3, 3), 0.0, 100.0)
    p = g.init_from_psf(psf)
    x = jnp.asarray(np.random.default_rng(1).random((1, 8, 8, 8, 1)), jnp.float32)
    y = g.apply(p, x, rng=None)  # no noise path
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_vgg_classifier():
    g = G.VGGNet(1, num_classes=2, vgg_type="VGG11")
    p = g.init(KEY, "normal", 0.02)
    y = g.apply(p, jnp.zeros((2, 32, 32, 1)))
    assert y.shape == (2, 2)


def test_unet_twoouts():
    g = G.UNetTwoOuts(4, 1)
    p = g.init(KEY, "normal", 0.02)
    y1, y2 = g.apply(p, jnp.zeros((1, 16, 16, 16, 1)))
    assert y1.shape == (1, 16, 16, 16, 1)
    assert y2.shape == (1, 16, 16, 16, 1)


def test_batch_norm_running_stats():
    """--norm batch: torch BatchNorm semantics — batch stats in train,
    running stats in eval, EMA buffer refresh (VERDICT missing item 5)."""
    import jax
    import numpy as np

    from neuroclear_tpu.nn import norms

    ns = norms.get_norm_spec("batch", 3)
    key = jax.random.PRNGKey(0)
    p = ns.init(key, 4)
    assert set(p) == {"scale", "offset", "running_mean", "running_var"}

    rng = np.random.default_rng(0)
    x = (rng.normal(2.0, 3.0, (2, 5, 5, 5, 4))).astype(np.float32)

    # train mode: normalised with batch stats -> ~zero mean/unit var before
    # the affine transform; running buffers unused
    y = np.asarray(ns.apply(p, x, train=True))
    pre = (y - np.asarray(p["offset"])) / np.asarray(p["scale"])
    assert abs(pre.mean()) < 1e-3 and abs(pre.std() - 1.0) < 1e-2

    # eval mode uses the running buffers (initially mean 0 / var 1 -> the
    # affine transform of x itself)
    y_eval = np.asarray(ns.apply(p, x, train=False))
    expect = x * np.asarray(p["scale"]) + np.asarray(p["offset"])
    np.testing.assert_allclose(y_eval, expect, rtol=1e-4, atol=1e-4)

    # trace-time eval context flips train-mode calls to running stats
    with norms.eval_mode():
        y_ctx = np.asarray(ns.apply(p, x, train=True))
    np.testing.assert_allclose(y_ctx, y_eval, rtol=1e-6, atol=1e-6)

    # collector + torch EMA: running = 0.9 * running + 0.1 * batch
    with norms.collect_batch_stats() as stats:
        ns.apply(p, x, train=True)
    (rm, rv), = norms.ema_update_stats(stats)
    bm = x.astype(np.float64).mean(axis=(0, 1, 2, 3))
    bv = x.astype(np.float64).var(axis=(0, 1, 2, 3))
    np.testing.assert_allclose(np.asarray(rm), 0.1 * bm, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(rv), 0.9 + 0.1 * bv, rtol=1e-4)


def test_batch_norm_refresh_in_train_step():
    """A --norm batch model's training step refreshes the generator running
    buffers (so --eval inference has real statistics to use)."""
    import argparse

    import jax
    import numpy as np

    from neuroclear_tpu.models.axial_to_lateral_gan_dryops_model import (
        AxialToLateralGANDryopsModel)

    opt = argparse.Namespace(
        isTrain=True, image_dimension=3, checkpoints_dir="/tmp/test_ck",
        name="bn", gpu_ids=[], input_nc=1, output_nc=1, ngf=8, ndf=8,
        netG="unet_vanilla", netD="pixel", n_layers_D=3, norm="batch",
        init_type="normal", init_gain=0.02, no_dropout=True,
        gan_mode="lsgan", lambda_A=5.0, lambda_plane=[1, 1, 1],
        randomize_projection_depth=False, projection_depth=4,
        min_projection_depth=2, beta1=0.1, lr=1e-3, direction="AtoB",
        lr_policy="constant", n_epochs=10, n_epochs_decay=10, epoch_count=1,
        lr_decay_iters=5, continue_train=False, load_iter=0, epoch="latest",
        verbose=False, seed=0)
    m = AxialToLateralGANDryopsModel(opt)
    m.setup(opt)

    def first_buffer(params):
        leaves = {}

        def walk(node, path):
            if isinstance(node, dict):
                if "running_mean" in node:
                    leaves[path] = np.asarray(node["running_mean"])
                for k in sorted(node):
                    walk(node[k], path + "/" + k)

        walk(params, "")
        return leaves

    before = first_buffer(m.params["G_A"])
    assert before, "batch-norm buffers missing from params"
    d_before = first_buffer(m.params["D_A_lateral"])
    assert d_before, "batch-norm buffers missing from discriminator params"
    x = np.random.default_rng(0).random((1, 16, 16, 16, 1)).astype(np.float32)
    m.set_input({"A": x, "A_paths": "x"})
    m.optimize_parameters()
    after = first_buffer(m.params["G_A"])
    assert set(before) == set(after)
    changed = any(not np.allclose(before[k], after[k]) for k in before)
    assert changed, "running stats were not refreshed by the train step"
    # torch also steps D BatchNorm buffers on every train forward
    # (VERDICT r2 weak #5) — the refresh pass must cover the D nets too
    d_after = first_buffer(m.params["D_A_lateral"])
    assert set(d_before) == set(d_after)
    d_changed = any(not np.allclose(d_before[k], d_after[k])
                    for k in d_before)
    assert d_changed, "D running stats were not refreshed by the train step"


def test_unet_deconv_remat_parity():
    """Per-block remat (gan_common.maybe_remat) must be a pure memory
    transform: identical forward values AND gradients vs remat=False."""
    import dataclasses

    g = G.UNetDeconv(1, 1, norm="instance")
    gr = dataclasses.replace(g, remat=True)
    p = g.init(KEY, "kaiming", 0.02)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 16, 16, 16, 1)),
                    jnp.float32)

    y0 = g.apply(p, x)
    y1 = gr.apply(p, x)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))

    def loss(apply_fn, p):
        return jnp.sum(apply_fn(p, x) ** 2)

    g0 = jax.grad(lambda q: loss(g.apply, q))(p)
    g1 = jax.grad(lambda q: loss(gr.apply, q))(p)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6), g0, g1)
