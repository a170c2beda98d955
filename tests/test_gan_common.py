"""gan_common helpers: config normalisation, projection depth sampling."""

import numpy as np

import jax
import jax.numpy as jnp

from neuroclear_tpu.models import gan_common as gc


def test_lambda_normalisation():
    cfg = gc.GanStepConfig(lambda_plane=(1, 2, 1))
    t, s, p = cfg.lambda_norm
    assert abs(t - 0.25) < 1e-9 and abs(s - 0.5) < 1e-9 and abs(p - 0.25) < 1e-9


def test_projection_depth_fixed():
    cfg = gc.GanStepConfig(randomize_projection_depth=False, projection_depth=7)
    assert gc.sample_projection_depth(jax.random.PRNGKey(0), cfg) == 7


def test_projection_depth_randomized_bounds():
    """apollo_model.py:160 — randint(max(2, min_depth), max_depth + 1)."""
    cfg = gc.GanStepConfig(randomize_projection_depth=True, projection_depth=10,
                           min_projection_depth=3)
    vals = [int(gc.sample_projection_depth(jax.random.PRNGKey(i), cfg))
            for i in range(300)]
    assert min(vals) >= 3 and max(vals) <= 10
    assert min(vals) == 3 and max(vals) == 10  # both bounds reachable

    cfg = gc.GanStepConfig(randomize_projection_depth=True, projection_depth=5,
                           min_projection_depth=0)  # floor at 2
    vals = [int(gc.sample_projection_depth(jax.random.PRNGKey(i), cfg))
            for i in range(200)]
    assert min(vals) == 2 and max(vals) == 5


def test_d_pair_symmetry():
    cfg = gc.GanStepConfig(gan_mode="lsgan")
    pred = jnp.asarray(np.random.default_rng(0).normal(size=(1, 4, 4, 1)),
                       jnp.float32)
    # (MSE(p,1) + MSE(p,0)) / 2
    expect = (np.mean((np.asarray(pred) - 1) ** 2)
              + np.mean(np.asarray(pred) ** 2)) * 0.5
    got = float(gc.d_pair(pred, pred, cfg))
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_precision_dtype():
    assert gc.GanStepConfig(precision="float32").compute_dtype == jnp.float32
    assert gc.GanStepConfig(precision="bfloat16").compute_dtype == jnp.bfloat16
