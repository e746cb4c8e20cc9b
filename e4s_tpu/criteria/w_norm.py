"""W-norm loss. Parity target: src/criteria/w_norm.py:5-14."""

from __future__ import annotations

import jax.numpy as jnp


def w_norm_loss(latent, latent_avg=None, start_from_latent_avg: bool = True):
    """latent: [B, R, n_latent, 512]; latent_avg: [n_latent, 512]."""
    if start_from_latent_avg:
        latent = latent - latent_avg[None, None]
    norms = jnp.sqrt(jnp.sum(latent**2, axis=(2, 3)))
    return jnp.sum(norms) / (latent.shape[0] * latent.shape[1])
