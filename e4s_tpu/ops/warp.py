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
