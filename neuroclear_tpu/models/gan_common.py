"""Shared machinery for the axial-to-lateral GAN models.

The reference runs ten-plus small discriminator probes per iteration, each
with fresh host randomness (SURVEY §3.4).  Here every probe is a jit-safe
device op (ops/sampling.py) keyed by an explicit PRNG split, and the whole
iteration — G forward, all probes, both Adam updates — is one compiled
program built by each model's ``make_step``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ..nn.losses import gan_loss
from ..ops.sampling import all_slices, random_projection, random_slice


def make_adam(beta1: float):
    """torch.optim.Adam(lr, betas=(beta1, 0.999)) parity; lr is applied by
    the caller so the schedule can change without rebuilding state."""
    return optax.scale_by_adam(b1=beta1, b2=0.999, eps=1e-8)


def apply_updates(params, updates, lr):
    return jax.tree_util.tree_map(lambda p, u: p - lr * u, params, updates)


def probe_slice(rng, vol, axis, d_apply):
    """iter_f (Apollo/Dryops flavour): D on one random slice
    (apollo_model.py:310-314)."""
    return d_apply(random_slice(rng, vol, axis))


def probe_proj(rng, vol, axis, depth, d_apply):
    """proj_f: D on a random-window MIP (apollo_model.py:316-320)."""
    return d_apply(random_projection(rng, vol, depth, axis))


def probe_all_slices(vol, axis, d_apply):
    """iter_f (Athena flavour): D on *every* slice, batched
    (athena_model.py:286-296)."""
    return d_apply(all_slices(vol, axis))


def sample_projection_depth(rng, cfg):
    """Per-iteration MIP depth (apollo_model.py:157-160)."""
    if not cfg.randomize_projection_depth:
        return cfg.projection_depth
    return jax.random.randint(
        rng, (), max(2, cfg.min_projection_depth), cfg.projection_depth + 1)


@dataclasses.dataclass(frozen=True)
class GanStepConfig:
    gan_mode: str = "lsgan"
    lambda_A: float = 10.0
    lambda_plane: tuple = (1, 1, 1)
    randomize_projection_depth: bool = False
    projection_depth: int = 10
    min_projection_depth: int = 2
    beta1: float = 0.1
    precision: str = "float32"  # compute dtype; params/Adam stay f32
    remat: bool = False  # jax.checkpoint the generators (fit big crops)
    # single-chip execution of the batch-N data-parallel recipe: N crops per
    # optimizer step, gradients accumulated sequentially with the per-step
    # probe keys shared across microbatches — exactly the math of the mesh
    # DP step (replicated keys, mean-of-per-sample grads), so a 1-chip run
    # validates the N-chip recipe's quality trajectory.
    grad_accum: int = 1
    # True (production default): accumulate via N separate jitted microbatch
    # dispatches into donated on-device grad trees — per-dispatch HBM stays
    # at the proven accum-1 footprint.  False: one fused lax.scan program
    # (the mesh-DP-shaped form; needs the whole batch resident — wedged the
    # 16 GB v5e at 8x148^3, docs/QUALITY.md round-4 session 2).
    accum_host: bool = True

    @property
    def lambda_norm(self):
        s = sum(self.lambda_plane)
        return tuple(f / s for f in self.lambda_plane)

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.precision == "bfloat16" else jnp.float32


def maybe_remat(apply_fn, cfg, net=None):
    """Return the memory-reduced apply when cfg.remat.

    Nets that support per-block rematerialisation (a `remat` dataclass field,
    e.g. UNetDeconv) are rebuilt with it enabled — the backward pass then
    holds one block's interior at a time, which is what actually cuts the
    fwd+bwd HBM peak (a whole-apply jax.checkpoint only defers it: a fresh
    apollo 148^3 step compile needed 19.7 GB).  Other nets fall back to the
    coarse whole-apply checkpoint (saves in/out only; good for shallow
    activation-free stacks like DeepLinearGenerator)."""
    if not cfg.remat:
        return apply_fn
    if net is not None and any(f.name == "remat"
                               for f in dataclasses.fields(net)):
        return dataclasses.replace(net, remat=True).apply
    return jax.checkpoint(apply_fn)


def g_gan(pred, cfg):
    return gan_loss(pred, True, cfg.gan_mode)


def d_pair(pred_real, pred_fake, cfg):
    """(GAN(real, True) + GAN(fake, False)) * 0.5 — backward_D_* parity."""
    return (gan_loss(pred_real, True, cfg.gan_mode)
            + gan_loss(pred_fake, False, cfg.gan_mode)) * 0.5


def grad_accum_scan(g_loss_fn, d_loss_fn, g_params, d_params, real,
                    visual_keys, compute_dtype):
    """Interleaved G/D microbatch gradient accumulation (GanStepConfig.
    grad_accum): scan over real's leading axis, evaluating BOTH grads at the
    pre-update params (identical math to the separate-loops form, since the
    reference's D step re-probes detached pre-G-update tensors) and summing
    them; only the last microbatch's visuals ride the carry — stacking all N
    at 148^3 beside the remat footprint measured RESOURCE_EXHAUSTED.

    g_loss_fn(gp, real_1) -> (total, aux) where aux contains visual_keys;
    d_loss_fn(dp, real_1, *visuals) -> (total, aux).
    Returns (g_grad_sum, d_grad_sum, visuals_tuple, stacked_aux)."""

    def micro(carry, real_i):
        g_acc, d_acc, _ = carry
        (_, g_aux), gi = jax.value_and_grad(
            g_loss_fn, has_aux=True)(g_params, real_i[None])
        vis = tuple(jax.lax.stop_gradient(g_aux.pop(k)) for k in visual_keys)
        (_, d_aux), di = jax.value_and_grad(
            d_loss_fn, has_aux=True)(d_params, real_i[None], *vis)
        g_acc = jax.tree.map(jnp.add, g_acc, gi)
        d_acc = jax.tree.map(jnp.add, d_acc, di)
        return (g_acc, d_acc, vis), {**g_aux, **d_aux}

    shape1 = (1,) + real.shape[1:]
    zero = (jax.tree.map(jnp.zeros_like, g_params),
            jax.tree.map(jnp.zeros_like, d_params),
            tuple(jnp.zeros(shape1, compute_dtype) for _ in visual_keys))
    (g_grads, d_grads, vis), auxs = jax.lax.scan(micro, zero, real)
    return g_grads, d_grads, vis, auxs
