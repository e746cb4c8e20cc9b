"""Masked per-region average pooling (the RGI texture-code extractor core).

The reference loops over every (sample, region) pair and calls
``masked_select`` (ref: src/models/encoders/psp_encoders.py:264-283) — a
data-dependent-shape pattern that cannot compile under XLA. Because the mean
over a boolean region is a plain weighted reduction, the whole loop collapses
into two einsums with static shapes, which XLA fuses into one pass over the
feature map.
"""

from __future__ import annotations

import jax.numpy as jnp

from e4s_tpu.ops.resize import nearest_resize


def masked_region_mean(
    feats: jnp.ndarray, segmap: jnp.ndarray, eps: float = 0.0,
    channels_last: bool = False,
) -> jnp.ndarray:
    """Per-region mean of feature vectors.

    Args:
      feats:  [B, F, H, W] feature map ([B, H, W, F] when ``channels_last``).
      segmap: [B, R, H', W'] one-hot region masks; nearest-resized to (H, W)
              (torch convention) before pooling.
      eps:    stabiliser added to the per-region pixel count. The reference
              leaves empty regions at exactly 0 (ref: psp_encoders.py:276-281);
              we reproduce that with a where() on the count.

    Returns:
      [B, R, F] per-region mean features; exactly 0 for empty regions.
    """
    if channels_last:
        B, H, W, F = feats.shape
    else:
        B, F, H, W = feats.shape
    seg = nearest_resize(segmap, (H, W)).astype(feats.dtype)
    # sum_hw feats[b,f,h,w] * seg[b,r,h,w]
    if channels_last:
        sums = jnp.einsum("bhwf,brhw->brf", feats, seg)
    else:
        sums = jnp.einsum("bfhw,brhw->brf", feats, seg)
    counts = jnp.sum(seg, axis=(-2, -1))[..., None]  # [B,R,1]
    mean = sums / jnp.maximum(counts, 1.0)
    if eps:
        mean = sums / (counts + eps)
    return jnp.where(counts > 0, mean, jnp.zeros_like(mean))
