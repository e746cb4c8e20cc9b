"""Laplacian-pyramid (multi-band) blending, OpenCV-parity, on device.

The reference runs cv2.pyrDown/pyrUp on host numpy
(ref: src/utils/multi_band_blending.py:6-75). We reproduce OpenCV's exact
5-tap Gaussian pyramid ([1,4,6,4,1]/16, REFLECT_101 borders) as jnp convs so
the whole blend stays on the TPU and fuses with the stitching math.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

from e4s_tpu.ops.resize import bilinear_resize

_GAUSS_1D = np.array([1.0, 4.0, 6.0, 4.0, 1.0], dtype=np.float32) / 16.0


def _blur5(x: jnp.ndarray, gain: float = 1.0) -> jnp.ndarray:
    """Separable 5-tap Gaussian with REFLECT_101 borders. x: [B,C,H,W]."""
    C = x.shape[1]
    k = jnp.asarray(_GAUSS_1D * gain, dtype=x.dtype)
    xp = jnp.pad(x, ((0, 0), (0, 0), (2, 2), (0, 0)), mode="reflect")
    kv = jnp.broadcast_to(k[:, None, None, None], (5, 1, 1, C))
    x = lax.conv_general_dilated(
        xp, kv, (1, 1), "VALID",
        dimension_numbers=("NCHW", "HWIO", "NCHW"), feature_group_count=C,
    )
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (2, 2)), mode="reflect")
    kh = jnp.broadcast_to(k[None, :, None, None], (1, 5, 1, C))
    return lax.conv_general_dilated(
        xp, kh, (1, 1), "VALID",
        dimension_numbers=("NCHW", "HWIO", "NCHW"), feature_group_count=C,
    )


def pyr_down(x: jnp.ndarray) -> jnp.ndarray:
    """cv2.pyrDown: Gaussian blur then take even rows/cols."""
    return _blur5(x)[:, :, ::2, ::2]


def pyr_up(x: jnp.ndarray) -> jnp.ndarray:
    """cv2.pyrUp: zero-stuff 2x then Gaussian blur with 4x gain."""
    B, C, H, W = x.shape
    up = jnp.zeros((B, C, H * 2, W * 2), dtype=x.dtype)
    up = up.at[:, :, ::2, ::2].set(x)
    return _blur5(up, gain=2.0)  # gain applies per separable axis: 2*2 = 4x


def laplacian_blend(
    a: jnp.ndarray, b: jnp.ndarray, mask: jnp.ndarray, num_levels: int = 10
) -> jnp.ndarray:
    """Blend a over b under mask with multi-band pyramids.

    a, b: [B,C,H,W]; mask: [B,C,H,W] float in [0,1] (broadcastable channels).
    out = sum over bands of  lap_a * m + lap_b * (1 - m).
    ref: src/utils/multi_band_blending.py:6-52 (num_levels=10 at 1024^2,
    ref: :52-75).
    """
    gp_a, gp_b, gp_m = [a], [b], [jnp.broadcast_to(mask, a.shape)]
    for _ in range(num_levels):
        gp_a.append(pyr_down(gp_a[-1]))
        gp_b.append(pyr_down(gp_b[-1]))
        gp_m.append(pyr_down(gp_m[-1]))

    # Band-limited pyramid: bottom Gaussian + Laplacian bands (top-down).
    ls = gp_a[num_levels - 1] * gp_m[num_levels - 1] + gp_b[num_levels - 1] * (
        1.0 - gp_m[num_levels - 1]
    )
    for i in range(num_levels - 1, 0, -1):
        la = gp_a[i - 1] - pyr_up(gp_a[i])
        lb = gp_b[i - 1] - pyr_up(gp_b[i])
        m = gp_m[i - 1]
        ls = pyr_up(ls) + la * m + lb * (1.0 - m)
    return ls


def blend_images(full_img, ori_img, mask, num_levels: int = 10):
    """1024^2 multi-band blend in [0,255], matching ``blending``.

    full_img/ori_img: [B,3,H,W] float in [0,255]; mask: [B,C,H,W] in [0,1].
    ref: src/utils/multi_band_blending.py:52-75
    """
    H, W = ori_img.shape[-2:]
    fi = bilinear_resize(full_img, (1024, 1024))
    oi = bilinear_resize(ori_img, (1024, 1024))
    m = bilinear_resize(mask, (1024, 1024))
    out = laplacian_blend(fi, oi, m, num_levels)
    out = jnp.clip(out, 0.0, 255.0)
    return bilinear_resize(out, (H, W))
