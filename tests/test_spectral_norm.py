"""Spectral-norm parity vs torch (VERDICT r2 weak #7).

Our ``_spectral_normalise`` is functionally pure: it runs ``n_iter`` power
iterations from the persistent ``u`` on every call, where torch's
``nn.utils.spectral_norm`` (reference: models/networks.py:1069-1110 wraps its
convs with it) mutates ``u`` in place, one iteration per forward by default.
Starting both from the SAME ``u`` and giving torch ``n_power_iterations=3``
makes one torch forward exactly equivalent to one call of ours, so the
normalised weights must agree elementwise.

The weight layouts differ — ours (k, k, in, out), torch (out, in, k, k) — but
the flattened power-iteration matrices are column permutations of each other,
which leaves every u-iterate and sigma unchanged.
"""

import numpy as np
import pytest
import torch

from neuroclear_tpu.nn.discriminators import (NLayerDiscriminator,
                                              _spectral_normalise)

import jax
import jax.numpy as jnp


def _torch_sn_weight(w_oikk: np.ndarray, u0: np.ndarray, n_iter: int,
                     calls: int = 1) -> np.ndarray:
    out_c, in_c, k, _ = w_oikk.shape
    conv = torch.nn.Conv2d(in_c, out_c, k, bias=False)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w_oikk))
    sn = torch.nn.utils.spectral_norm(conv, n_power_iterations=n_iter)
    with torch.no_grad():
        sn.weight_u.copy_(torch.nn.functional.normalize(
            torch.from_numpy(u0), dim=0))
    sn.train()
    x = torch.zeros(1, in_c, k, k)
    for _ in range(calls):
        sn(x)
    return sn.weight.detach().numpy()


@pytest.mark.parametrize("shape", [(8, 4, 4), (64, 3, 4), (5, 7, 3)])
def test_sigma_matches_torch(shape):
    out_c, in_c, k = shape
    rng = np.random.default_rng(0)
    w_oikk = rng.normal(size=(out_c, in_c, k, k)).astype(np.float32)
    u0 = rng.normal(size=(out_c,)).astype(np.float32)

    ref = _torch_sn_weight(w_oikk, u0, n_iter=3)

    w_ours = jnp.asarray(np.transpose(w_oikk, (2, 3, 1, 0)))  # (k,k,in,out)
    got = _spectral_normalise(w_ours, jnp.asarray(u0), n_iter=3)
    got_oikk = np.transpose(np.asarray(got), (3, 2, 0, 1))

    np.testing.assert_allclose(got_oikk, ref, rtol=0, atol=2e-5)


def test_stateless_vs_torch_persistent_drift_is_bounded():
    """Documented deviation: after N torch forwards u has N*n_iter total
    iterations; ours always restarts from the stored u. Both converge to the
    same top singular value, so the drift must stay small for these shapes."""
    rng = np.random.default_rng(1)
    out_c, in_c, k = 16, 8, 4
    w_oikk = rng.normal(size=(out_c, in_c, k, k)).astype(np.float32)
    u0 = rng.normal(size=(out_c,)).astype(np.float32)

    ref10 = _torch_sn_weight(w_oikk, u0, n_iter=1, calls=10)
    w_ours = jnp.asarray(np.transpose(w_oikk, (2, 3, 1, 0)))
    got = np.transpose(
        np.asarray(_spectral_normalise(w_ours, jnp.asarray(u0), n_iter=3)),
        (3, 2, 0, 1))
    # same true sigma target; 3 iterations get within ~1% of 10
    np.testing.assert_allclose(got, ref10, rtol=2e-2, atol=2e-2)


def test_sn_discriminator_unit_spectral_norm():
    """End-to-end: every conv the SN PatchGAN actually applies has spectral
    norm ~1 after normalisation (power-iteration estimate from its own u)."""
    d = NLayerDiscriminator(input_nc=1, ndf=8, n_layers=3, norm="instance",
                            dim=2, spectral=True)
    p = d.init(jax.random.PRNGKey(0), "normal", 0.02)
    for name, conv, _ in d._convs():
        cp = p[name]
        if "u" not in cp:
            continue
        wn = _spectral_normalise(cp["w"], cp["u"])
        m = np.asarray(wn).reshape(-1, conv.out_c)
        sigma = np.linalg.svd(m, compute_uv=False)[0]
        # the 3-iteration estimate lower-bounds the true sigma, so the
        # normalised true sigma sits in [1, ~1.2) at random init (raw,
        # un-normalised weights would show ~0.05-0.3 here)
        assert 0.999 < sigma < 1.3, (name, sigma)
