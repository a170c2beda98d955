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
