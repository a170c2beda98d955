"""Pin _spectral_normalise against torch.nn.utils.spectral_norm.

VERDICT r2 weak #7: the repo's spectral norm runs 3 power iterations from a
frozen u (functionally pure) where torch persists u across calls.  This pins
the per-call math: with the same starting u and n_power_iterations=3, one
torch forward must produce the same sigma (sigma is invariant to the column
permutation between torch's (out, in*k*k) and our (k*k*in, out) layouts,
since the power iteration only touches W W^T).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_sigma_matches_torch_three_iter():
    from neuroclear_tpu.nn.discriminators import _spectral_normalise

    g = torch.Generator().manual_seed(0)
    conv = torch.nn.Conv2d(3, 8, 4, bias=False)
    with torch.no_grad():
        conv.weight.copy_(torch.randn(conv.weight.shape, generator=g))
    w_torch = conv.weight.detach().numpy().copy()  # (out, in, k, k)

    sn = torch.nn.utils.spectral_norm(conv, n_power_iterations=3, eps=1e-12)
    u0 = np.random.default_rng(1).standard_normal(8).astype(np.float32)
    with torch.no_grad():
        sn.weight_u.copy_(torch.from_numpy(u0))
        # one training-mode forward runs the 3 power iterations from u0 and
        # normalises the weight by the resulting sigma
        sn.train()
        _ = sn(torch.zeros(1, 3, 8, 8))
        w_sn = sn.weight.detach().numpy()
    sigma_torch = float(np.median(w_torch / w_sn))

    # ours: (k, k, in, out) layout, same u0, 3 iterations per call
    w_jax = np.transpose(w_torch, (2, 3, 1, 0)).copy()
    out = np.asarray(_spectral_normalise(w_jax, u0, n_iter=3))
    sigma_ours = float(np.median(w_jax / out))

    np.testing.assert_allclose(sigma_ours, sigma_torch, rtol=1e-4)
    # and the normalised weights agree elementwise (same permutation back)
    np.testing.assert_allclose(np.transpose(out, (3, 2, 0, 1)), w_sn,
                               rtol=2e-4, atol=1e-6)
