"""GAN losses vs torch; slice/MIP sampling semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neuroclear_tpu.nn.losses import gan_loss, l1_loss
from neuroclear_tpu.ops.sampling import all_slices, random_projection, random_slice

torch = pytest.importorskip("torch")


def test_gan_loss_lsgan_vanilla_wgan():
    rng = np.random.default_rng(0)
    pred = rng.normal(size=(2, 5, 5, 1)).astype(np.float32)
    tp = torch.tensor(pred)

    mse = torch.nn.MSELoss()
    bce = torch.nn.BCEWithLogitsLoss()
    for real, target in [(True, 1.0), (False, 0.0)]:
        tt = torch.full_like(tp, target)
        np.testing.assert_allclose(
            float(gan_loss(jnp.asarray(pred), real, "lsgan")),
            float(mse(tp, tt)), rtol=1e-5)
        np.testing.assert_allclose(
            float(gan_loss(jnp.asarray(pred), real, "vanilla")),
            float(bce(tp, tt)), rtol=1e-5)
    np.testing.assert_allclose(float(gan_loss(jnp.asarray(pred), True, "wgan")),
                               -pred.mean(), rtol=1e-5)
    np.testing.assert_allclose(float(gan_loss(jnp.asarray(pred), False, "wgan")),
                               pred.mean(), rtol=1e-5)


def test_l1_loss():
    a = np.random.default_rng(1).normal(size=(4, 4)).astype(np.float32)
    b = np.random.default_rng(2).normal(size=(4, 4)).astype(np.float32)
    np.testing.assert_allclose(float(l1_loss(jnp.asarray(a), jnp.asarray(b))),
                               np.abs(a - b).mean(), rtol=1e-6)


def _vol():
    return jnp.asarray(
        np.random.default_rng(3).random((1, 6, 7, 8, 1)), jnp.float32)


def test_random_slice_is_a_real_slice():
    vol = _vol()
    for axis, n in [(0, 6), (1, 7), (2, 8)]:
        sl = random_slice(jax.random.PRNGKey(0), vol, axis)
        candidates = [np.asarray(jnp.take(vol, i, axis=axis + 1)) for i in range(n)]
        assert any(np.array_equal(np.asarray(sl), c) for c in candidates)


def test_random_projection_matches_windowed_max():
    vol = _vol()
    depth = 3
    for axis in range(3):
        n = vol.shape[axis + 1]
        mip = np.asarray(random_projection(jax.random.PRNGKey(7), vol, depth, axis))
        # must equal max over SOME window of `depth` consecutive slices
        windows = [np.asarray(jnp.max(
            jax.lax.slice_in_dim(vol, s, s + depth, axis=axis + 1), axis=axis + 1))
            for s in range(n - depth)]
        assert any(np.allclose(mip, w) for w in windows)


def test_random_projection_traced_depth():
    vol = _vol()

    @jax.jit
    def f(key, depth):
        return random_projection(key, vol, depth, 0)

    y = f(jax.random.PRNGKey(0), jnp.int32(2))
    assert y.shape == (1, 7, 8, 1)
    assert np.isfinite(np.asarray(y)).all()


def test_all_slices_batches_every_slice():
    vol = _vol()
    for axis, n in [(0, 6), (1, 7), (2, 8)]:
        sl = np.asarray(all_slices(vol, axis))
        assert sl.shape[0] == n
        for i in range(n):
            np.testing.assert_array_equal(
                sl[i], np.asarray(jnp.take(vol, i, axis=axis + 1))[0])
