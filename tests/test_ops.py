"""Golden parity tests for core ops vs torch (CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neuroclear_tpu.nn.core import Conv, ConvTranspose, InstanceNorm, max_pool

torch = pytest.importorskip("torch")


def _np(x):
    return np.asarray(x)


def test_conv3d_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 8, 8, 8, 3)).astype(np.float32)
    w = rng.normal(size=(3, 3, 3, 3, 5)).astype(np.float32)  # DHWIO
    b = rng.normal(size=(5,)).astype(np.float32)

    conv = Conv(3, 3, 5, 3, 1, 1)
    y = conv.apply({"w": jnp.asarray(w), "b": jnp.asarray(b)}, jnp.asarray(x))

    tw = torch.tensor(w).permute(4, 3, 0, 1, 2)  # -> OIDHW
    tx = torch.tensor(x).permute(0, 4, 1, 2, 3)
    ty = torch.nn.functional.conv3d(tx, tw, torch.tensor(b), 1, 1)
    ty = ty.permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(_np(y), ty, atol=2e-4)


def test_conv2d_stride2_pad1_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 9, 9, 2)).astype(np.float32)
    w = rng.normal(size=(4, 4, 2, 3)).astype(np.float32)
    conv = Conv(2, 2, 3, 4, 2, 1, bias=False)
    y = conv.apply({"w": jnp.asarray(w)}, jnp.asarray(x))
    tw = torch.tensor(w).permute(3, 2, 0, 1)
    tx = torch.tensor(x).permute(0, 3, 1, 2)
    ty = torch.nn.functional.conv2d(tx, tw, None, 2, 1).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(_np(y), ty, atol=2e-4)
    assert y.shape == ty.shape


def test_conv_transpose3d_2x_upsampling_shape_and_value():
    """k=2, s=2 transpose conv: each input voxel spreads into a 2x2x2 block."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 4, 4, 4, 3)).astype(np.float32)
    w = rng.normal(size=(2, 2, 2, 3, 5)).astype(np.float32)
    ct = ConvTranspose(3, 3, 5, 2, 2, bias=False)
    y = _np(ct.apply({"w": jnp.asarray(w)}, jnp.asarray(x)))
    assert y.shape == (1, 8, 8, 8, 5)
    # block (di,dj,dk) of output voxel (2i+di,...) = sum_ci x[i,ci]*w[di,dj,dk,ci,:]
    expect = np.einsum("bzyxc,ijkco->bzyxijko", x, w)
    # interleave (z,i)(y,j)(x,k): dims (b,z,y,x,i,j,k,o) -> (b,z,i,y,j,x,k,o)
    expect = expect.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(1, 8, 8, 8, 5)
    np.testing.assert_allclose(y, expect, atol=2e-4)

    # torch parity
    tw = torch.tensor(w).permute(3, 4, 0, 1, 2)  # -> (in, out, k, k, k)
    tx = torch.tensor(x).permute(0, 4, 1, 2, 3)
    ty = torch.nn.functional.conv_transpose3d(tx, tw, stride=2)
    ty = ty.permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(y, ty, atol=2e-4)


def test_maxpool3d_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 9, 8, 7, 4)).astype(np.float32)  # odd dims floor
    y = _np(max_pool(jnp.asarray(x), 2, 3))
    tx = torch.tensor(x).permute(0, 4, 1, 2, 3)
    ty = torch.nn.functional.max_pool3d(tx, 2).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(y, ty, atol=1e-6)


def test_instance_norm_matches_torch():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 6, 7, 8, 3)).astype(np.float32) * 5 + 2
    y = _np(InstanceNorm(3).apply(jnp.asarray(x)))
    tx = torch.tensor(x).permute(0, 4, 1, 2, 3)
    inorm = torch.nn.InstanceNorm3d(3, affine=False, track_running_stats=False)
    ty = inorm(tx).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(y, ty, atol=1e-4)


def test_init_statistics():
    from neuroclear_tpu.nn.core import init_weight

    key = jax.random.PRNGKey(0)
    kshape = (3, 3, 3, 64, 64)
    w = _np(init_weight(key, kshape, "kaiming", 0.02))
    fan_in = 3 * 3 * 3 * 64
    assert abs(w.std() - np.sqrt(2.0 / fan_in)) < 0.05 * np.sqrt(2.0 / fan_in)
    w = _np(init_weight(key, kshape, "normal", 0.02))
    assert abs(w.std() - 0.02) < 0.002
    w = _np(init_weight(key, kshape, "xavier", 1.0))
    assert abs(w.std() - np.sqrt(2.0 / (2 * fan_in))) < 0.01

    # orthogonal: rows of the (out, rest) flattening are orthonormal
    w = _np(init_weight(key, (2, 2, 3, 8), "orthogonal", 1.0))
    m = w.reshape(-1, 8).T  # (out, rest)
    np.testing.assert_allclose(m @ m.T, np.eye(8), atol=1e-4)


def test_pallas_conv3d_parity():
    """Pallas dense-K conv kernel vs lax.conv_general_dilated (VERDICT #2
    'covered by a parity test'): forward + both VJPs, interpret mode."""
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    os.environ["NEUROCLEAR_PALLAS_INTERPRET"] = "1"
    os.environ["NEUROCLEAR_PALLAS_CONV"] = "1"
    import importlib

    from neuroclear_tpu.ops import pallas_conv as pc
    importlib.reload(pc)
    try:
        rng = np.random.default_rng(0)
        for cin, cout, shape in [(64, 64, (1, 5, 8, 32)),
                                 (128, 64, (2, 4, 4, 32))]:
            x = jnp.asarray(rng.normal(size=shape + (cin,)).astype(np.float32))
            w = jnp.asarray((rng.normal(size=(3, 3, 3, cin, cout)) * 0.05)
                            .astype(np.float32))
            assert pc.supported(x.shape, w.shape, (1, 1, 1), "SAME", (1, 1, 1))
            y = pc.conv3d_3x3(x, w)
            ref = jax.lax.conv_general_dilated(
                x, w, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            assert float(jnp.max(jnp.abs(y - ref))) < 1e-4 * float(
                jnp.max(jnp.abs(ref)) + 1)

            gx, gw = jax.grad(
                lambda x, w: jnp.sum(jnp.square(pc.conv3d_3x3(x, w))),
                (0, 1))(x, w)
            rx, rw = jax.grad(
                lambda x, w: jnp.sum(jnp.square(jax.lax.conv_general_dilated(
                    x, w, (1, 1, 1), "SAME",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC")))),
                (0, 1))(x, w)
            assert float(jnp.max(jnp.abs(gx - rx))) < 1e-3 * float(
                jnp.max(jnp.abs(rx)) + 1)
            assert float(jnp.max(jnp.abs(gw - rw))) < 1e-3 * float(
                jnp.max(jnp.abs(rw)) + 1)

        # unsupported geometries stay on XLA
        assert not pc.supported((1, 5, 8, 32, 7), (3, 3, 3, 7, 64),
                                (1, 1, 1), "SAME", (1, 1, 1))
        assert not pc.supported((1, 5, 8, 32, 64), (5, 5, 5, 64, 64),
                                (1, 1, 1), "SAME", (1, 1, 1))
    finally:
        os.environ.pop("NEUROCLEAR_PALLAS_INTERPRET", None)
        os.environ.pop("NEUROCLEAR_PALLAS_CONV", None)
        importlib.reload(pc)


def test_conv_zpack2_parity_and_grads():
    """Output-z-pair packed conv (ops/conv_zpack.py) vs
    lax.conv_general_dilated: forward parity and both gradients (the packed
    kernel is rebuilt from w inside the op, so tied-weight gradients must
    sum to the direct conv's dw)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from neuroclear_tpu.ops.conv_zpack import conv3d_zpack2, supported

    rng = np.random.default_rng(0)
    for cin, shape in [(64, (1, 6, 8, 16)), (128, (2, 4, 4, 16)),
                       (1, (1, 8, 8, 8))]:
        x = jnp.asarray(rng.normal(size=shape + (cin,)).astype(np.float32))
        w = jnp.asarray((rng.normal(size=(3, 3, 3, cin, 64)) * 0.05)
                        .astype(np.float32))
        assert supported(x.shape, cin, 64, 3, 1, 1, 3)

        def ref(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1, 1), ((1, 1),) * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

        y_ref = ref(x, w)
        y = conv3d_zpack2(x, w)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   atol=2e-5, rtol=2e-5)

        g = jnp.asarray(rng.normal(size=y.shape).astype(np.float32))
        dx_r, dw_r = jax.grad(lambda x, w: (ref(x, w) * g).sum(),
                              argnums=(0, 1))(x, w)
        dx, dw = jax.grad(lambda x, w: (conv3d_zpack2(x, w) * g).sum(),
                          argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_r),
                                   atol=2e-4, rtol=2e-4)
        np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_r),
                                   atol=2e-4, rtol=2e-4)
    # odd D / other cout stay on the XLA path
    assert not supported((1, 5, 8, 16, 64), 64, 64, 3, 1, 1, 3)
    assert not supported((1, 6, 8, 16, 64), 64, 128, 3, 1, 1, 3)


def test_conv_wpack2_parity_and_grads():
    """W-pair lane-packed conv (ops/conv_wpack.py) vs
    lax.conv_general_dilated: forward parity and both gradients.  The
    packing itself is a free reshape (W, C are the NDHWC minor dims); the
    packed kernel is rebuilt from w inside the op so tied-weight gradients
    must sum to the direct conv's dw."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from neuroclear_tpu.ops.conv_wpack import conv3d_wpack2, supported

    rng = np.random.default_rng(1)
    for cin, shape in [(64, (1, 6, 8, 16)), (128, (2, 4, 4, 12))]:
        x = jnp.asarray(rng.normal(size=shape + (cin,)).astype(np.float32))
        w = jnp.asarray((rng.normal(size=(3, 3, 3, cin, 64)) * 0.05)
                        .astype(np.float32))
        assert supported(x.shape, cin, 64, 3, 1, 1, 3)

        def ref(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1, 1), ((1, 1),) * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

        y_ref = ref(x, w)
        y = conv3d_wpack2(x, w)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   atol=2e-5, rtol=2e-5)

        g = jnp.asarray(rng.normal(size=y.shape).astype(np.float32))
        dx_r, dw_r = jax.grad(lambda x, w: (ref(x, w) * g).sum(),
                              argnums=(0, 1))(x, w)
        dx, dw = jax.grad(lambda x, w: (conv3d_wpack2(x, w) * g).sum(),
                          argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_r),
                                   atol=2e-4, rtol=2e-4)
        np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_r),
                                   atol=2e-4, rtol=2e-4)
    # odd W / other cout / cin outside {64,128} stay on the XLA path
    assert not supported((1, 6, 8, 15, 64), 64, 64, 3, 1, 1, 3)
    assert not supported((1, 6, 8, 16, 64), 64, 128, 3, 1, 1, 3)
    assert not supported((1, 6, 8, 16, 32), 32, 64, 3, 1, 1, 3)


def test_conv_wpack_pallas_interpret_parity():
    """The Pallas W-pack kernel (ops/pallas_wconv.py) matches the direct
    conv in interpret mode, forward and via its custom VJP."""
    import os

    import numpy as np

    os.environ["NEUROCLEAR_PALLAS_WCONV"] = "1"
    os.environ["NEUROCLEAR_PALLAS_INTERPRET"] = "1"
    import importlib

    import jax
    import jax.numpy as jnp

    from neuroclear_tpu.ops import pallas_wconv

    importlib.reload(pallas_wconv)
    try:
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(1, 4, 6, 8, 64)).astype(np.float32))
        w = jnp.asarray((rng.normal(size=(3, 3, 3, 64, 64)) * 0.05)
                        .astype(np.float32))
        assert pallas_wconv.supported(x.shape, 64, 64, 3, 1, 1, 3)

        def ref(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1, 1), ((1, 1),) * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

        y = pallas_wconv.conv3d_wpack_pallas(x, w)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref(x, w)),
                                   atol=2e-5, rtol=2e-5)
        dx_r, dw_r = jax.grad(
            lambda x, w: (ref(x, w) ** 2).sum(), argnums=(0, 1))(x, w)
        dx, dw = jax.grad(
            lambda x, w: (pallas_wconv.conv3d_wpack_pallas(x, w) ** 2).sum(),
            argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_r),
                                   atol=2e-4, rtol=2e-4)
        np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_r),
                                   atol=2e-4, rtol=2e-4)
    finally:
        os.environ.pop("NEUROCLEAR_PALLAS_WCONV", None)
        os.environ.pop("NEUROCLEAR_PALLAS_INTERPRET", None)
        importlib.reload(pallas_wconv)


def test_conv_wpack_pallas_backward_kernels():
    """The Pallas BACKWARD kernels (dx = packed conv of the cotangent with
    the flipped/transposed kernel; dw = the packed reduction kernel +
    pack_weights adjoint) match the XLA transposed-conv backward for both
    production cin widths, through both the plain and the packed-resident
    entries (interpret mode)."""
    import os

    import numpy as np

    os.environ["NEUROCLEAR_PALLAS_WCONV"] = "1"
    os.environ["NEUROCLEAR_PALLAS_INTERPRET"] = "1"
    import importlib

    import jax
    import jax.numpy as jnp

    from neuroclear_tpu.ops import pallas_wconv

    importlib.reload(pallas_wconv)
    try:
        rng = np.random.default_rng(3)
        for cin in (64, 128):
            x = jnp.asarray(rng.normal(size=(1, 4, 6, 16, cin))
                            .astype(np.float32))
            w = jnp.asarray((rng.normal(size=(3, 3, 3, cin, 64)) * 0.05)
                            .astype(np.float32))
            g = jnp.asarray(rng.normal(size=(1, 4, 6, 16, 64))
                            .astype(np.float32))
            assert pallas_wconv._bwd_plans_ok(x.shape, x.dtype, cin)

            dx_p, dw_p = pallas_wconv._bwd((x, w), g)
            dx_r, dw_r = pallas_wconv._bwd_xla((x, w), g)
            np.testing.assert_allclose(np.asarray(dx_p), np.asarray(dx_r),
                                       atol=2e-4, rtol=2e-4)
            np.testing.assert_allclose(np.asarray(dw_p), np.asarray(dw_r),
                                       atol=2e-4, rtol=2e-4)

            # packed-resident entry: same cotangent, packed layout
            xp = x.reshape(1, 4, 6, 8, 2 * cin)
            gp = g.reshape(1, 4, 6, 8, 128)
            dxp_p, dwp_p = jax.vjp(
                pallas_wconv.conv3d_wpack_pallas_packed, xp, w)[1](gp)
            np.testing.assert_allclose(np.asarray(dxp_p),
                                       np.asarray(dx_r.reshape(xp.shape)),
                                       atol=2e-4, rtol=2e-4)
            np.testing.assert_allclose(np.asarray(dwp_p), np.asarray(dw_r),
                                       atol=2e-4, rtol=2e-4)
    finally:
        os.environ.pop("NEUROCLEAR_PALLAS_WCONV", None)
        os.environ.pop("NEUROCLEAR_PALLAS_INTERPRET", None)
        importlib.reload(pallas_wconv)
