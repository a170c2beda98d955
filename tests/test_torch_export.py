"""Cross-framework checkpoint interchange: our params <-> reference .pth.

The strongest parity check in the suite: weights exported to the
reference's state-dict format are loaded into the ACTUAL reference network
code (executed from the mounted reference tree) and the two frameworks'
forward passes are compared numerically.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neuroclear_tpu.nn import generators as G
from neuroclear_tpu.nn import discriminators as D
from neuroclear_tpu.utils import torch_export as tx

torch = pytest.importorskip("torch")

REF_NETWORKS = "/root/reference/models/networks.py"


def _load_reference_networks(modname):
    """Load the mounted reference's networks.py (read-only) for comparison."""
    import importlib.util
    import sys

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")  # for its util.util import
    spec = importlib.util.spec_from_file_location(modname, REF_NETWORKS)
    ref = importlib.util.module_from_spec(spec)
    sys.modules[modname] = ref
    try:
        spec.loader.exec_module(ref)
    except Exception as e:
        pytest.skip(f"reference module not importable: {e}")
    return ref


def test_roundtrip_unet_deconv(tmp_path):
    g = G.UNetDeconv(1, 1, norm="instance")
    p = g.init(jax.random.PRNGKey(0), "kaiming", 0.02)
    path = str(tmp_path / "latest_net_G_A.pth")
    tx.export_pth(p, "unet_deconv", path)
    back = tx.import_pth(path, "unet_deconv")
    flat_a = jax.tree_util.tree_leaves(p)
    flat_b = jax.tree_util.tree_leaves(back)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.skipif(not os.path.exists(REF_NETWORKS),
                    reason="reference not mounted")
def test_forward_parity_with_reference_unet():
    """Export our weights, load into the reference's torch Unet_deconv,
    compare forward outputs."""
    ref = _load_reference_networks("ref_networks")

    g = G.UNetDeconv(1, 1, norm="instance")
    p = g.init(jax.random.PRNGKey(1), "kaiming", 0.02)
    sd = {k: torch.tensor(v) for k, v in
          tx.params_to_state_dict(p, "unet_deconv").items()}

    tnet = ref.Unet_deconv(1, 1,
                           norm_layer=ref.get_norm_layer("instance", 3),
                           dimension=3)
    missing, unexpected = tnet.load_state_dict(sd, strict=True), None
    tnet.eval()

    x = np.random.default_rng(2).random((1, 12, 12, 12, 1)).astype(np.float32)
    ours = np.asarray(g.apply(p, jnp.asarray(x)))
    with torch.no_grad():
        theirs = tnet(torch.tensor(x).permute(0, 4, 1, 2, 3))
    theirs = theirs.permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


@pytest.mark.skipif(not os.path.exists(REF_NETWORKS),
                    reason="reference not mounted")
def test_forward_parity_with_reference_deep_linear_and_patchgan():
    ref = _load_reference_networks("ref_networks2")

    # deep_linear_gen
    g = G.DeepLinearGenerator(1, 1)
    p = g.init(jax.random.PRNGKey(3), "normal", 0.02)
    sd = {k: torch.tensor(v) for k, v in
          tx.params_to_state_dict(p, "deep_linear_gen").items()}
    tnet = ref.DeepLinearGenerator(1, 1)
    tnet.load_state_dict(sd, strict=True)
    x = np.random.default_rng(4).random((1, 14, 14, 14, 1)).astype(np.float32)
    ours = np.asarray(g.apply(p, jnp.asarray(x)))
    with torch.no_grad():
        theirs = tnet(torch.tensor(x).permute(0, 4, 1, 2, 3))
    np.testing.assert_allclose(ours, theirs.permute(0, 2, 3, 4, 1).numpy(),
                               atol=2e-5)

    # basic PatchGAN
    d = D.NLayerDiscriminator(1, 64, 3, "instance", dim=2)
    pd = d.init(jax.random.PRNGKey(5), "normal", 0.02)
    sd = {k: torch.tensor(v) for k, v in
          tx.params_to_state_dict(pd, "basic").items()}
    tnet = ref.NLayerDiscriminator(1, 64, 3,
                                   norm_layer=ref.get_norm_layer("instance", 2),
                                   dimension=2)
    tnet.load_state_dict(sd, strict=True)
    xd = np.random.default_rng(6).random((1, 48, 48, 1)).astype(np.float32)
    ours = np.asarray(d.apply(pd, jnp.asarray(xd)))
    with torch.no_grad():
        theirs = tnet(torch.tensor(xd).permute(0, 3, 1, 2))
    np.testing.assert_allclose(ours, theirs.permute(0, 2, 3, 1).numpy(),
                               atol=2e-5)
