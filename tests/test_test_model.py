"""TestModel + export CLI script coverage."""

import argparse
import subprocess
import sys
import os

import numpy as np

import jax


def _topt(tmp, suffix="_A"):
    return argparse.Namespace(
        isTrain=False, image_dimension=3, checkpoints_dir=str(tmp), name="tm",
        gpu_ids=[], input_nc=1, output_nc=1, ngf=8, netG="linearkernel",
        norm="instance", init_type="normal", init_gain=0.02, no_dropout=True,
        model_suffix=suffix, load_iter=0, epoch="latest", verbose=False,
        seed=0, direction="AtoB", lr_policy="constant")


def test_test_model_load_and_forward(tmp_path):
    from neuroclear_tpu.models.test_model import TestModel

    opt = _topt(tmp_path)
    m = TestModel(opt)
    m.save_networks("latest")  # writes latest_net_G_A.npz
    assert os.path.exists(tmp_path / "tm" / "latest_net_G_A.npz")

    m2 = TestModel(opt)
    m2.load_networks("latest")
    x = np.random.default_rng(0).random((1, 8, 8, 8, 1)).astype(np.float32)
    m2.set_input({"A": x, "A_paths": "p"})
    m2.test()
    visuals = m2.get_current_visuals()
    assert set(visuals) == {"real", "fake"}
    a = np.asarray(m.nets["G_A"].apply(m.params["G_A"], x))
    b = np.asarray(visuals["fake"])
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_export_cli_roundtrip(tmp_path):
    from neuroclear_tpu.nn import generators as G
    from neuroclear_tpu.nn.core import flatten_params

    g = G.DeepLinearGenerator(1, 1)
    p = g.init(jax.random.PRNGKey(0), "normal", 0.02)
    src = tmp_path / "iter_5_net_G_B.npz"
    np.savez(src, **flatten_params(p))
    pth = tmp_path / "iter_5_net_G_B.pth"
    back = tmp_path / "back.npz"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    for mode, s, d in [("export", src, pth), ("import", pth, back)]:
        r = subprocess.run(
            [sys.executable, "scripts/export_checkpoint.py", "--mode", mode,
             "--arch", "deep_linear_gen", "--src", str(s), "--dst", str(d)],
            capture_output=True, text=True, env=env, cwd=os.getcwd())
        assert r.returncode == 0, r.stderr[-500:]
    orig = np.load(src)
    rt = np.load(back)
    assert set(orig.files) == set(rt.files)
    for k in orig.files:
        np.testing.assert_array_equal(orig[k], rt[k])
