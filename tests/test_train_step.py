"""Fused train-step tests with light-weight networks (fast CPU compiles):
netG=linearkernel, netD=pixel keep the graph tiny while exercising the full
step machinery (probes, Adam, donation, loss bookkeeping)."""

import argparse

import numpy as np
import pytest

import jax


def _opt(model="axial_to_lateral_gan_apollo", **kw):
    base = dict(
        isTrain=True, image_dimension=3, checkpoints_dir="/tmp/test_ck",
        name="t", gpu_ids=[], input_nc=1, output_nc=1, ngf=8, ndf=8,
        netG="linearkernel", netG_B="linearkernel", netD="pixel",
        n_layers_D=3, norm="instance", init_type="normal", init_gain=0.02,
        no_dropout=True, gan_mode="lsgan", lambda_A=5.0, lambda_plane=[1, 1, 1],
        randomize_projection_depth=True, projection_depth=4,
        min_projection_depth=2, beta1=0.1, lr=1e-3, direction="AtoB",
        lr_policy="constant", n_epochs=10, n_epochs_decay=10, epoch_count=1,
        lr_decay_iters=5, continue_train=False, load_iter=0, epoch="latest",
        verbose=False, seed=0, model=model, conversion_plane=["yz", "xy"],
        pool_size=50)
    base.update(kw)
    return argparse.Namespace(**base)


def _run_steps(model_cls, opt, n=3, shape=(1, 12, 12, 12, 1)):
    m = model_cls(opt)
    m.setup(opt)
    x = np.random.default_rng(0).random(shape).astype(np.float32)
    m.set_input({"A": x, "A_paths": "x"})
    losses = []
    for _ in range(n):
        m.optimize_parameters()
        losses.append(m.get_current_losses())
    return m, losses


def test_apollo_step_runs_and_updates():
    from neuroclear_tpu.models.axial_to_lateral_gan_apollo_model import (
        AxialToLateralGANApolloModel)

    opt = _opt()
    m, losses = _run_steps(AxialToLateralGANApolloModel, opt)
    for ls in losses:
        assert set(ls) == set(m.loss_names)
        assert all(np.isfinite(v) for v in ls.values()), ls
    # params actually moved
    m2 = AxialToLateralGANApolloModel(opt)
    diff = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        m.params["G_A"], m2.params["G_A"])
    assert max(jax.tree_util.tree_leaves(diff)) > 0


def test_apollo_checkpoint_resume_restores_optimizer():
    from neuroclear_tpu.models.axial_to_lateral_gan_apollo_model import (
        AxialToLateralGANApolloModel)

    opt = _opt()
    m, _ = _run_steps(AxialToLateralGANApolloModel, opt, n=2)
    m.save_networks("iter_2")

    m2 = AxialToLateralGANApolloModel(opt)
    m2.load_networks("iter_2")
    for name in m.model_names:
        a = jax.tree_util.tree_leaves(m.params[name])
        b = jax.tree_util.tree_leaves(m2.params[name])
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    sa = jax.tree_util.tree_leaves(m.opt_state)
    sb = jax.tree_util.tree_leaves(m2.opt_state)
    assert len(sa) == len(sb)
    for x, y in zip(sa, sb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_dryops_step_runs():
    from neuroclear_tpu.models.axial_to_lateral_gan_dryops_model import (
        AxialToLateralGANDryopsModel)

    opt = _opt(model="axial_to_lateral_gan_dryops")
    m, losses = _run_steps(AxialToLateralGANDryopsModel, opt)
    assert set(losses[-1]) == {"D_A_lateral", "D_A_axial", "G_A", "G_A_lateral",
                               "G_A_axial"}
    assert all(np.isfinite(v) for v in losses[-1].values())


def test_athena_step_runs():
    from neuroclear_tpu.models.axial_to_lateral_gan_athena_model import (
        AxialToLateralGANAthenaModel)

    opt = _opt(model="axial_to_lateral_gan_athena")
    m, losses = _run_steps(AxialToLateralGANAthenaModel, opt, n=2,
                           shape=(1, 10, 10, 10, 1))
    assert all(np.isfinite(v) for v in losses[-1].values())
    assert "cycle_A" in losses[-1] and "D_A_xz" in losses[-1]


def test_adam_parity_with_torch():
    """Our scale_by_adam + lr application == torch.optim.Adam trajectory."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    from neuroclear_tpu.models.gan_common import apply_updates, make_adam

    w0 = np.array([1.0, -2.0, 3.0], np.float32)
    grads = [np.array([0.1, -0.2, 0.3], np.float32),
             np.array([-0.05, 0.1, 0.2], np.float32),
             np.array([0.3, 0.0, -0.1], np.float32)]
    lr, beta1 = 1e-3, 0.1

    tw = torch.nn.Parameter(torch.tensor(w0))
    topt = torch.optim.Adam([tw], lr=lr, betas=(beta1, 0.999))
    for g in grads:
        topt.zero_grad()
        tw.grad = torch.tensor(g)
        topt.step()

    optim = make_adam(beta1)
    p = {"w": jnp.asarray(w0)}
    state = optim.init(p)
    for g in grads:
        updates, state = optim.update({"w": jnp.asarray(g)}, state)
        p = apply_updates(p, updates, lr)
    np.testing.assert_allclose(np.asarray(p["w"]), tw.detach().numpy(),
                               rtol=1e-5, atol=1e-7)


def test_dryrun_multichip_entrypoints_importable():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    y = jax.jit(fn)(*args)
    assert y[0].shape == (1, 32, 32, 32, 1)
