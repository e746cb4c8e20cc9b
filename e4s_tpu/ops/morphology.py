"""Grayscale morphology on [B,C,H,W] maps, XLA reduce_window-native.

The reference vendors a kornia-style unfold/conv implementation
(ref: src/utils/morphology.py:23-470). On TPU, flat-structuring-element
morphology is exactly a windowed max/min reduction, which XLA lowers to a
single fused reduce_window pass — no unfold materialisation.

Semantics parity (checked in tests/test_morphology.py):
- ``border_type='geodesic'`` == pad with -max_val (dilation) / +max_val
  (erosion) so out-of-image values never win the reduction.
- non-flat / masked kernels supported via the additive neighborhood trick
  (entries where kernel==0 get -max_val).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

MAX_VAL = 1e4


def _flat_window_reduce(x, se_h, se_w, origin, init, reduce_fn, pad_val):
    # A full-ones rectangular SE is separable: reduce rows then columns —
    # O(kh+kw) comparisons per pixel instead of O(kh*kw). The padding
    # sentinel never wins either 1-D reduction, so results are identical.
    pad_e = ((origin[0], se_h - origin[0] - 1), (origin[1], se_w - origin[1] - 1))
    xp = jnp.pad(
        x, ((0, 0), (0, 0), pad_e[0], pad_e[1]), constant_values=pad_val
    )
    if se_h > 1 and se_w > 1:
        xp = lax.reduce_window(
            xp, init, reduce_fn, (1, 1, se_h, 1), (1, 1, 1, 1), "VALID"
        )
        return lax.reduce_window(
            xp, init, reduce_fn, (1, 1, 1, se_w), (1, 1, 1, 1), "VALID"
        )
    return lax.reduce_window(
        xp, init, reduce_fn, (1, 1, se_h, se_w), (1, 1, 1, 1), "VALID"
    )


def _masked_reduce(x, kernel, origin, mode):
    """General path for non-ones kernels: shift-and-reduce with -inf masking."""
    se_h, se_w = kernel.shape
    sign = 1.0 if mode == "dilation" else -1.0
    pad_val = -MAX_VAL if mode == "dilation" else MAX_VAL
    pad_e = ((origin[0], se_h - origin[0] - 1), (origin[1], se_w - origin[1] - 1))
    xp = jnp.pad(x, ((0, 0), (0, 0), pad_e[0], pad_e[1]), constant_values=pad_val)
    H, W = x.shape[-2:]
    acc = None
    kflip = np.asarray(kernel)[::-1, ::-1] if mode == "dilation" else np.asarray(kernel)
    for dy in range(se_h):
        for dx in range(se_w):
            if kflip[dy, dx] == 0:
                continue
            win = lax.slice(
                xp, (0, 0, dy, dx), (x.shape[0], x.shape[1], dy + H, dx + W)
            )
            term = sign * win
            acc = term if acc is None else jnp.maximum(acc, term)
    return sign * acc


def dilation(x: jnp.ndarray, kernel) -> jnp.ndarray:
    """Flat grayscale dilation (max over the structuring element).

    ref: src/utils/morphology.py:23-109 with default geodesic border.
    x: [B,C,H,W]; kernel: [kh,kw] array-like (nonzero = in SE).
    """
    kernel = np.asarray(kernel)
    se_h, se_w = kernel.shape
    origin = (se_h // 2, se_w // 2)
    if np.all(kernel != 0):
        return _flat_window_reduce(
            x, se_h, se_w, origin, -jnp.inf, lax.max, -MAX_VAL
        )
    return _masked_reduce(x, kernel, origin, "dilation")


def erosion(x: jnp.ndarray, kernel) -> jnp.ndarray:
    """Flat grayscale erosion (min over the structuring element).

    ref: src/utils/morphology.py:111-199 with default geodesic border.
    """
    kernel = np.asarray(kernel)
    se_h, se_w = kernel.shape
    origin = (se_h // 2, se_w // 2)
    if np.all(kernel != 0):
        return _flat_window_reduce(x, se_h, se_w, origin, jnp.inf, lax.min, MAX_VAL)
    return _masked_reduce(x, kernel, origin, "erosion")


def opening(x, kernel):
    """ref: src/utils/morphology.py:201-270"""
    return dilation(erosion(x, kernel), kernel)


def closing(x, kernel):
    """ref: src/utils/morphology.py:272-342"""
    return erosion(dilation(x, kernel), kernel)


def gradient(x, kernel):
    """dilation - erosion. ref: src/utils/morphology.py:344-403"""
    return dilation(x, kernel) - erosion(x, kernel)


def top_hat(x, kernel):
    """x - opening. ref: src/utils/morphology.py:405-468"""
    return x - opening(x, kernel)


def bottom_hat(x, kernel):
    """closing - x. ref: src/utils/morphology.py:470-533"""
    return closing(x, kernel) - x


def create_masks(mask: jnp.ndarray, outer_dilation: int = 0, operation: str = "dilation"):
    """Content / border / full masks for face stitching.

    ref: scripts/face_swap.py:30-48
    mask: [B,1,H,W] float in {0,1}.
    """
    radius = outer_dilation
    k = np.ones((2 * radius + 1, 2 * radius + 1), dtype=np.float32)
    if operation == "dilation":
        full_mask = dilation(mask, k)
        border_mask = full_mask - mask
    elif operation == "erosion":
        full_mask = erosion(mask, k)
        border_mask = mask - full_mask
    elif operation == "expansion":
        full_mask = dilation(mask, k)
        erosion_mask = erosion(mask, k)
        border_mask = full_mask - erosion_mask
    else:
        raise ValueError(operation)
    border_mask = jnp.clip(border_mask, 0, 1)
    return mask, border_mask, full_mask
