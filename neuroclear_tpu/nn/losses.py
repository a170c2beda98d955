"""GAN objectives + gradient penalty (reference: models/networks.py:252-359)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gan_loss(prediction: jnp.ndarray, target_is_real: bool, gan_mode: str,
             real_label: float = 1.0, fake_label: float = 0.0) -> jnp.ndarray:
    """GANLoss.__call__ parity: lsgan -> MSE, vanilla -> BCE-with-logits,
    wgan* -> +-mean (networks.py:301-319)."""
    pred = prediction.astype(jnp.float32)
    if gan_mode == "lsgan":
        target = real_label if target_is_real else fake_label
        return jnp.mean(jnp.square(pred - target))
    if gan_mode == "vanilla":
        target = real_label if target_is_real else fake_label
        # BCEWithLogits: max(x,0) - x*t + log(1+exp(-|x|))
        return jnp.mean(
            jnp.maximum(pred, 0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred))))
    if "wgan" in gan_mode:
        return -jnp.mean(pred) if target_is_real else jnp.mean(pred)
    raise NotImplementedError(f"gan mode {gan_mode} not implemented")


def l1_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))


def gradient_penalty(d_apply, d_params, real, fake, rng, kind: str = "mixed",
                     constant: float = 1.0, lambda_gp: float = 10.0):
    """WGAN-GP penalty (networks.py:321-359), as a pure function.

    d_apply: fn(params, x) -> prediction.
    """
    if lambda_gp <= 0.0:
        return 0.0
    if kind == "real":
        interp = real
    elif kind == "fake":
        interp = fake
    elif kind == "mixed":
        alpha = jax.random.uniform(rng, (real.shape[0],) + (1,) * (real.ndim - 1))
        interp = alpha * real + (1 - alpha) * fake
    else:
        raise NotImplementedError(f"{kind} not implemented")

    def d_sum(x):
        return jnp.sum(d_apply(d_params, x))

    grads = jax.grad(d_sum)(interp)
    grads = grads.reshape(real.shape[0], -1)
    gnorm = jnp.linalg.norm(grads + 1e-16, axis=1)
    return jnp.mean(jnp.square(gnorm - constant)) * lambda_gp
