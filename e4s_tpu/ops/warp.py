"""Grid sampling (torch F.grid_sample parity) — 2D and 3D.

Needed by the FaceVid2Vid re-enactor's 3-D feature warping
(ref: src/pretrained/face_vid2vid/modules/dense_motion.py:76,
generator.py:209). torch semantics: grid in [-1,1] with last-dim order
(x, y[, z]) indexing (W, H[, D]); bilinear/trilinear; zeros padding;
align_corners=False.

Implemented as gather + lerp on unnormalised coordinates — XLA fuses the
8-corner gathers into a single pass; no scatter, fully differentiable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(coord, size, align_corners: bool):
    if align_corners:
        return (coord + 1.0) / 2.0 * (size - 1)
    return ((coord + 1.0) * size - 1.0) / 2.0


def _gather_2d(img, ix, iy):
    """img: [C,H,W]; ix/iy: [...] int32 -> [C, ...] with zero padding."""
    H, W = img.shape[-2:]
    valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
    ixc = jnp.clip(ix, 0, W - 1)
    iyc = jnp.clip(iy, 0, H - 1)
    vals = img[:, iyc, ixc]
    return jnp.where(valid[None], vals, 0.0)


def grid_sample_2d(input, grid, align_corners: bool = False):
    """input: [N,C,H,W]; grid: [N,Ho,Wo,2] (x,y) -> [N,C,Ho,Wo]."""

    def one(img, g):
        x = _unnormalize(g[..., 0], img.shape[-1], align_corners)
        y = _unnormalize(g[..., 1], img.shape[-2], align_corners)
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        wx = x - x0
        wy = y - y0
        v00 = _gather_2d(img, x0, y0)
        v01 = _gather_2d(img, x0 + 1, y0)
        v10 = _gather_2d(img, x0, y0 + 1)
        v11 = _gather_2d(img, x0 + 1, y0 + 1)
        top = v00 * (1 - wx) + v01 * wx
        bot = v10 * (1 - wx) + v11 * wx
        return top * (1 - wy) + bot * wy

    return jax.vmap(one)(input, grid)


def _gather_3d(vol, ix, iy, iz):
    """vol: [C,D,H,W]; indices [...] -> [C, ...] with zero padding."""
    D, H, W = vol.shape[-3:]
    valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H) & (iz >= 0) & (iz < D)
    ixc = jnp.clip(ix, 0, W - 1)
    iyc = jnp.clip(iy, 0, H - 1)
    izc = jnp.clip(iz, 0, D - 1)
    vals = vol[:, izc, iyc, ixc]
    return jnp.where(valid[None], vals, 0.0)


def grid_sample_3d(input, grid, align_corners: bool = False):
    """input: [N,C,D,H,W]; grid: [N,Do,Ho,Wo,3] (x,y,z) -> [N,C,Do,Ho,Wo]."""

    def one(vol, g):
        x = _unnormalize(g[..., 0], vol.shape[-1], align_corners)
        y = _unnormalize(g[..., 1], vol.shape[-2], align_corners)
        z = _unnormalize(g[..., 2], vol.shape[-3], align_corners)
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        z0 = jnp.floor(z).astype(jnp.int32)
        wx = x - x0
        wy = y - y0
        wz = z - z0

        def corner(dz, dy, dx):
            return _gather_3d(vol, x0 + dx, y0 + dy, z0 + dz)

        c000 = corner(0, 0, 0)
        c001 = corner(0, 0, 1)
        c010 = corner(0, 1, 0)
        c011 = corner(0, 1, 1)
        c100 = corner(1, 0, 0)
        c101 = corner(1, 0, 1)
        c110 = corner(1, 1, 0)
        c111 = corner(1, 1, 1)
        c00 = c000 * (1 - wx) + c001 * wx
        c01 = c010 * (1 - wx) + c011 * wx
        c10 = c100 * (1 - wx) + c101 * wx
        c11 = c110 * (1 - wx) + c111 * wx
        c0 = c00 * (1 - wy) + c01 * wy
        c1 = c10 * (1 - wy) + c11 * wy
        return c0 * (1 - wz) + c1 * wz

    return jax.vmap(one)(input, grid)


def affine_warp(img, m_inv, out_hw):
    """``cv2.warpAffine(src, M, dsize, flags=bilinear)`` on device.

    img: [C, H, W] float; ``m_inv``: [2, 3] DST->SRC affine (i.e. the
    inverse of the M passed to cv2.warpAffine — cv2 inverts internally;
    invert on the host with ``cv2.invertAffineTransform`` and pass it here).
    Zero border (cv2 default BORDER_CONSTANT value 0). Used by the
    device-resident GPEN restore chain
    (ref: src/pretrained/gpen/face_enhancement.py:69-95 cv2.warpAffine
    calls; flags=3 degrades to bilinear in warpAffine).
    """
    out_h, out_w = out_hw
    ys, xs = jnp.meshgrid(
        jnp.arange(out_h, dtype=img.dtype),
        jnp.arange(out_w, dtype=img.dtype),
        indexing="ij",
    )
    sx = m_inv[0, 0] * xs + m_inv[0, 1] * ys + m_inv[0, 2]
    sy = m_inv[1, 0] * xs + m_inv[1, 1] * ys + m_inv[1, 2]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = sx - x0
    wy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    v00 = _gather_2d(img, x0i, y0i)
    v01 = _gather_2d(img, x0i + 1, y0i)
    v10 = _gather_2d(img, x0i, y0i + 1)
    v11 = _gather_2d(img, x0i + 1, y0i + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def gaussian_blur_cv2(x, ksize: int, sigma: float):
    """``cv2.GaussianBlur(x, (ksize, ksize), sigma)`` on device.

    x: [..., H, W]; separable FIR with cv2's exact kernel
    (exp(-i^2 / (2 sigma^2)), normalised) and BORDER_REFLECT_101 padding.
    Used by the GPEN mask feathering (face_enhancement.py:29-31, 46-49:
    double blur (101,101)/11).
    """
    assert ksize % 2 == 1
    r = ksize // 2
    i = jnp.arange(-r, r + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (i / sigma) ** 2)
    k = (k / k.sum()).astype(x.dtype)
    xp = jnp.pad(
        x, [(0, 0)] * (x.ndim - 2) + [(r, r), (0, 0)], mode="reflect"
    )
    # separable along H then W via windowed dot: use correlation through
    # conv_general_dilated on a flattened batch
    def conv1d_lastdim(a, kern):
        shape = a.shape
        a2 = a.reshape(-1, 1, shape[-1])
        out = jax.lax.conv_general_dilated(
            a2, kern.reshape(1, 1, -1), (1,), [(0, 0)],
            dimension_numbers=("NCH", "OIH", "NCH"),
        )
        return out.reshape(shape[:-1] + (out.shape[-1],))

    y = jnp.swapaxes(conv1d_lastdim(jnp.swapaxes(xp, -1, -2), k), -1, -2)
    yp = jnp.pad(
        y, [(0, 0)] * (x.ndim - 2) + [(0, 0), (r, r)], mode="reflect"
    )
    return conv1d_lastdim(yp, k)
