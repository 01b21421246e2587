"""GAN losses, relativistic (RaGAN) pairing, gradient penalty, perceptual loss.

Specs from the reference: ``GANLoss`` (``codes/models/modules/loss.py:6-38``) —
vanilla = BCE-with-logits against constant real/fake labels, lsgan = MSE,
wgan-gp = ±mean; ``GradientPenaltyLoss`` (``loss.py:41-60``) = (‖∇D(x̂)‖₂ − 1)²;
the RaGAN pairing lives in the trainer in the reference
(``codes/models/SRRaGAN_model.py:133-138,149-154``) and is exposed here as
composable helpers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gan_loss(logits: jnp.ndarray, target_is_real: bool, kind: str = "vanilla",
             real_label: float = 1.0, fake_label: float = 0.0) -> jnp.ndarray:
    """Scalar GAN loss for a batch of critic outputs."""
    if kind == "wgan-gp":
        return -jnp.mean(logits) if target_is_real else jnp.mean(logits)
    target = jnp.full_like(logits, real_label if target_is_real else fake_label)
    if kind == "vanilla":
        # BCE with logits: softplus formulation is numerically stable.
        return jnp.mean(jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    if kind == "lsgan":
        return jnp.mean((logits - target) ** 2)
    raise NotImplementedError(f"gan type [{kind}]")


def ragan_g_loss(d_real: jnp.ndarray, d_fake: jnp.ndarray, kind: str = "vanilla") -> jnp.ndarray:
    """Relativistic-average generator loss:
    (L(D(real) − E[D(fake)], fake) + L(D(fake) − E[D(real)], real)) / 2."""
    return (gan_loss(d_real - jnp.mean(d_fake), False, kind)
            + gan_loss(d_fake - jnp.mean(d_real), True, kind)) / 2.0


def ragan_d_loss(d_real: jnp.ndarray, d_fake: jnp.ndarray, kind: str = "vanilla") -> jnp.ndarray:
    """Relativistic-average discriminator loss:
    (L(D(real) − E[D(fake)], real) + L(D(fake) − E[D(real)], fake)) / 2."""
    return (gan_loss(d_real - jnp.mean(d_fake), True, kind)
            + gan_loss(d_fake - jnp.mean(d_real), False, kind)) / 2.0


def gradient_penalty(d_apply, params, real: jnp.ndarray, fake: jnp.ndarray,
                     rng) -> jnp.ndarray:
    """WGAN-GP penalty at random interpolates. ``d_apply(params, x) → logits``."""
    eps = jax.random.uniform(rng, (real.shape[0], 1, 1, 1), real.dtype)
    interp = real * eps + fake * (1.0 - eps)

    def critic_sum(x):
        return jnp.sum(d_apply(params, x))

    grads = jax.grad(critic_sum)(interp)
    norms = jnp.sqrt(jnp.sum(grads ** 2, axis=(1, 2, 3)) + 1e-12)
    return jnp.mean((norms - 1.0) ** 2)


def charbonnier_loss(pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    return jnp.mean(jnp.sqrt((pred - target) ** 2 + eps * eps))
