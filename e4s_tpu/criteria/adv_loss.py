"""Adversarial + regularisation losses.

Parity target: src/criteria/adv_loss.py:8-59. JAX convs are natively
twice-differentiable, so the R1 penalty is a plain jax.grad composition — the
reference's conv2d_gradfix/no_weight_gradients machinery is unnecessary.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def adv_g_loss(fake_pred):
    """Non-saturating softplus G loss. ref: adv_loss.py:8-15"""
    return jnp.mean(jax.nn.softplus(-fake_pred))


def adv_d_loss(real_pred, fake_pred):
    """ref: adv_loss.py:17-25"""
    return jnp.mean(jax.nn.softplus(-real_pred)) + jnp.mean(
        jax.nn.softplus(fake_pred)
    )


def d_r1_loss(d_apply, d_params, real_img):
    """R1 gradient penalty: E[|grad_x D(x)|^2]. ref: adv_loss.py:29-40.

    d_apply: callable (params, img) -> [B,1] logits.
    """
    def score(img):
        return jnp.sum(d_apply(d_params, img))

    grad_real = jax.grad(score)(real_img)
    return jnp.mean(jnp.sum(grad_real.reshape(grad_real.shape[0], -1) ** 2, axis=1))


def g_path_regularize(fake_img, latents_grad_fn, mean_path_length, rng, decay=0.01):
    """Path-length regulariser. ref: adv_loss.py:43-59.

    latents_grad_fn: callable(noise_img) -> grad of sum(fake*noise) wrt latents.
    """
    noise = jax.random.normal(rng, fake_img.shape) / math.sqrt(
        fake_img.shape[2] * fake_img.shape[3]
    )
    grad = latents_grad_fn(noise)
    path_lengths = jnp.sqrt(jnp.mean(jnp.sum(grad**2, axis=2), axis=1))
    path_mean = mean_path_length + decay * (jnp.mean(path_lengths) - mean_path_length)
    path_penalty = jnp.mean((path_lengths - path_mean) ** 2)
    return path_penalty, jax.lax.stop_gradient(path_mean), path_lengths
