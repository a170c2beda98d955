"""Packed-resident conv blocks (ops/packed_block.py): the W-pair lane
packing held ACROSS a ConvBlock's conv -> instance-norm -> ReLU units must
be a pure layout transform — identical values and gradients to the plain
NDHWC path (up to conv reduction reassociation)."""

import numpy as np
import jax
import jax.numpy as jnp

from neuroclear_tpu.ops import packed_block as pb
from neuroclear_tpu.ops.pallas_ops import instance_norm

KEY = jax.random.PRNGKey(0)


def _enable(on):
    # tests drive the runtime switch (env unset in CI)
    pb.set_enabled(on)
    assert pb.ENABLED == on, "env var pins the gate; unset it for this test"


def test_instance_norm_fold_parity():
    """fold=2 on the packed layout == unpack -> instance_norm -> repack,
    values and gradients."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 4, 6, 8, 32)).astype(np.float32) * 3
                    + 1.5)
    xp = pb.pack(x)

    y_ref = instance_norm(x)
    y_pk = pb.unpack(instance_norm(xp, 2))
    np.testing.assert_allclose(np.asarray(y_pk), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)

    g = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    dx_ref = jax.grad(lambda v: (instance_norm(v) * g).sum())(x)
    dx_pk = pb.unpack(jax.grad(
        lambda v: (instance_norm(v, 2) * pb.pack(g)).sum())(xp))
    np.testing.assert_allclose(np.asarray(dx_pk), np.asarray(dx_ref),
                               atol=1e-5, rtol=1e-5)


def _block_parity(in_c, n, remat=False, shape=(1, 6, 8, 16)):
    from neuroclear_tpu.nn.generators import ConvBlock
    from neuroclear_tpu.nn.norms import get_norm_spec

    ns = get_norm_spec("instance", 3)
    blk = ConvBlock(3, in_c, 64, n, ns, remat=remat)
    p = blk.init(KEY, "kaiming", 0.02)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=shape + (in_c,)).astype(np.float32))

    _enable(False)
    y_ref = blk.apply(p, x)
    _enable(True)
    try:
        y_pk = blk.apply(p, x)
    finally:
        _enable(False)
    np.testing.assert_allclose(np.asarray(y_pk), np.asarray(y_ref),
                               atol=2e-4, rtol=2e-4)

    g = jnp.asarray(rng.normal(size=y_ref.shape).astype(np.float32))

    def loss(p, x):
        return (blk.apply(p, x) * g).sum()

    dref = jax.grad(loss, argnums=(0, 1))(p, x)
    _enable(True)
    try:
        dpk = jax.grad(loss, argnums=(0, 1))(p, x)
    finally:
        _enable(False)
    for a, b in zip(jax.tree_util.tree_leaves(dpk),
                    jax.tree_util.tree_leaves(dref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4)


def test_convblock_packed_parity_64():
    """64->64 double block: both units packed-resident."""
    _block_parity(64, 2)


def test_convblock_packed_parity_cin1_head():
    """double_conv1 shape (cin=1): unit 0 stays on the plain path, unit 1
    runs packed — the transition must be seamless."""
    _block_parity(1, 2)


def test_convblock_packed_parity_128_single():
    """ex_conv1_1 shape (128->64, n=1)."""
    _block_parity(128, 1)


def test_convblock_packed_parity_remat():
    """Per-unit checkpointing composes with the packed layout."""
    _block_parity(64, 2, remat=True)


def test_unet_deconv_packed_parity():
    """Whole production generator, packed blocks on vs off."""
    from neuroclear_tpu.nn import generators as G

    g = G.UNetDeconv(1, 1, norm="instance")
    p = g.init(KEY, "kaiming", 0.02)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 16, 1)).astype(np.float32))

    _enable(False)
    y_ref = g.apply(p, x)
    _enable(True)
    try:
        y_pk = g.apply(p, x)
    finally:
        _enable(False)
    np.testing.assert_allclose(np.asarray(y_pk), np.asarray(y_ref),
                               atol=2e-4, rtol=2e-4)


def test_packed_gate_eligibility():
    """Odd W, unsupported channel plans and batch norm stay on the plain
    path (unit_supported False)."""
    _enable(True)
    try:
        assert pb.unit_supported((1, 6, 8, 16, 64), 64, 64, 3, 1, 1, 3,
                                 "instance")
        assert not pb.unit_supported((1, 6, 8, 15, 64), 64, 64, 3, 1, 1, 3,
                                     "instance")  # odd W
        assert not pb.unit_supported((1, 6, 8, 16, 64), 64, 128, 3, 1, 1, 3,
                                     "instance")  # cout != 64
        assert not pb.unit_supported((1, 6, 8, 16, 32), 32, 64, 3, 1, 1, 3,
                                     "instance")  # cin not packable
        assert not pb.unit_supported((1, 6, 8, 16, 64), 64, 64, 3, 1, 1, 3,
                                     "batch")     # running-stats norm
    finally:
        _enable(False)
    assert not pb.unit_supported((1, 6, 8, 16, 64), 64, 64, 3, 1, 1, 3,
                                 "instance")      # gate off


def test_packed_parity_under_mesh():
    """Batch-sharded UNetDeconv forward+grad on a virtual mesh: the packed
    layout's W-pair reshapes must partition cleanly (batch sharded, W not)
    and match the plain path — guards the multi-chip DP dryrun if packed
    blocks become the default."""
    import pytest

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from neuroclear_tpu.nn import generators as G

    g = G.UNetDeconv(1, 1, norm="instance")
    p = g.init(KEY, "kaiming", 0.02)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, 8, 8, 16, 1)).astype(np.float32))
    gcot = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))

    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))

    def run(on):
        # fresh function object per leg: the packed gate is read at trace
        # time, so reusing one jit cache would silently skip the second leg
        def loss(q, v):
            return (g.apply(q, v) * gcot).sum()

        _enable(on)
        try:
            return jax.jit(jax.value_and_grad(loss))(p, xs)
        finally:
            _enable(False)

    l_ref, d_ref = run(False)
    l_pk, d_pk = run(True)
    np.testing.assert_allclose(float(l_pk), float(l_ref), rtol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(d_pk),
                    jax.tree_util.tree_leaves(d_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4)


def test_max_pool_packed_parity():
    """Packed pool == unpack -> MaxPool3d(2), including floor semantics on
    odd D/H."""
    from neuroclear_tpu.nn.core import max_pool

    rng = np.random.default_rng(4)
    for shape in [(2, 6, 8, 16, 32), (1, 7, 5, 12, 16)]:
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        y_ref = max_pool(x, 2, 3)
        y_pk = pb.max_pool_packed(pb.pack(x))
        np.testing.assert_allclose(np.asarray(y_pk), np.asarray(y_ref),
                                   atol=0, rtol=0)


def test_exit_packed_plan():
    """exit_packed mirrors apply()'s per-unit decisions."""
    from neuroclear_tpu.nn.generators import ConvBlock
    from neuroclear_tpu.nn.norms import get_norm_spec

    ns = get_norm_spec("instance", 3)
    _enable(True)
    try:
        blk = ConvBlock(3, 1, 64, 2, ns)
        assert blk._packed_plan((1, 6, 8, 16, 1)) == [False, True]
        assert blk.exit_packed((1, 6, 8, 16, 1))
        assert not blk.exit_packed((1, 6, 8, 15, 1))       # odd W
        blk128 = ConvBlock(3, 64, 128, 2, ns)
        assert blk128._packed_plan((1, 6, 8, 16, 64)) == [False, False]
    finally:
        _enable(False)
    assert not blk.exit_packed((1, 6, 8, 16, 1))           # gate off
