"""Pallas TPU kernel for the patch-modulated 3x3 convolution.

This fuses the heart of E4S's mask-guided modulated conv (see
ops/modconv.py's module docstring for the math): per output row-band it

  1. reads three row-shifted, width-padded copies of the input as ordinary
     aligned VMEM blocks (no manual halo DMA — the axon runtime does not
     support arbitrary-offset DMA from HBM refs),
  2. accumulates the nine shifted (smap * x_shift) @ W_tap matmuls on the
     MXU in f32 without materialising any of the nine modulated copies,
  3. applies the per-pixel demodulation epilogue in-register.

The XLA path materialises the nine modulated [B,Ci,H,W] intermediates in
HBM; the kernel's traffic is a 3x read of x + smap + dmap + one write.

Layout: NHWC inside the kernel (channels on lanes); the public wrapper
transposes from the framework's NCHW at the boundary.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


TW = 128  # lane-width chunk of W per grid cell


def _kernel(x6_ref, smap_ref, dmap_ref, w_ref, out_ref, *, TH, Ci, Co):
    # x6_ref block: [1, 3, TH, 1, TW+2, Ci] — row-shifted, W-chunked slabs
    smap = smap_ref[0]  # [TH, TW, Ci]
    acc = jnp.zeros((TH * TW, Co), dtype=jnp.float32)
    for ty in range(3):
        xband = x6_ref[0, ty, :, 0]  # [TH, TW+2, Ci]
        for tx in range(3):
            xs = xband[:, tx : tx + TW, :]
            mod = (xs * smap).reshape(TH * TW, Ci)
            acc = acc + jnp.dot(
                mod,
                w_ref[(ty * 3 + tx) * Ci : (ty * 3 + tx + 1) * Ci, :],
                preferred_element_type=jnp.float32,
            )
    out = acc.reshape(TH, TW, Co)
    out_ref[0] = (out * dmap_ref[0].astype(jnp.float32)).astype(out_ref.dtype)


def _pick_th(H, W, Ci, Co):
    if W % TW != 0:
        return None
    for th in (16, 8):
        if H % th == 0:
            vmem = 4 * (
                2 * 3 * th * (TW + 2) * Ci     # x slabs (double buffered)
                + 2 * th * TW * (Ci + 2 * Co)  # smap + dmap + out (buffered)
                + 2 * th * TW * max(Ci, Co)    # acc + mod temps
                + 9 * Ci * Co                  # weights
            )
            if vmem < 10 * 1024 * 1024:
                return th
    return None


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run(x6, smap, dmap, w9, *, interpret=False):
    B, three, H, NJ, TWp, Ci = x6.shape
    W = NJ * TW
    Co = w9.shape[1]
    TH = _pick_th(H, W, Ci, Co)
    kernel = functools.partial(_kernel, TH=TH, Ci=Ci, Co=Co)
    return pl.pallas_call(
        kernel,
        grid=(B, H // TH, NJ),
        in_specs=[
            pl.BlockSpec(
                (1, 3, TH, 1, TWp, Ci), lambda b, i, j: (b, 0, i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, TH, TW, Ci), lambda b, i, j: (b, i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, TH, TW, Co), lambda b, i, j: (b, i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w9 replicated
        ],
        out_specs=pl.BlockSpec(
            (1, TH, TW, Co), lambda b, i, j: (b, i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Co), smap.dtype),
        interpret=interpret,
    )(x6, smap, dmap, w9)


def patch_mod_conv3(x, w, smap, dmap, interpret=False):
    """NCHW wrapper matching ops.modconv._patch_mod_conv's contract.

    x, smap: [B,Ci,H,W]; w: [Co,Ci,3,3]; dmap: [B,Co,H,W] or None.
    """
    B, Ci, H, W = x.shape
    Co = w.shape[0]
    # NHWC + pad 1; three row-shifted copies; W pre-chunked into overlapping
    # TW+2 slabs so every Pallas block is aligned (no halo DMA needed)
    xp = jnp.transpose(
        jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1))), (0, 2, 3, 1)
    )
    x3 = jnp.stack([xp[:, 0:H], xp[:, 1 : H + 1], xp[:, 2 : H + 2]], axis=1)
    nj = W // TW
    x6 = jnp.stack(
        [x3[:, :, :, j * TW : j * TW + TW + 2, :] for j in range(nj)], axis=3
    )  # [B, 3, H, NJ, TW+2, Ci]
    smap_t = jnp.transpose(smap, (0, 2, 3, 1))
    if dmap is None:
        dmap_t = jnp.ones((B, H, W, Co), smap.dtype)
    else:
        dmap_t = jnp.transpose(dmap, (0, 2, 3, 1))
    w9 = jnp.transpose(w, (2, 3, 1, 0)).reshape(9 * Ci, Co)
    out = _run(x6, smap_t, dmap_t, w9, interpret=interpret)
    return jnp.transpose(out, (0, 3, 1, 2))


def pallas_supported_shape(H: int, W: int, Ci: int, Co: int) -> bool:
    """Tiling / VMEM feasibility check for dispatch from ops.modconv."""
    if W < 128 or W % 128 != 0 or H < 8:
        return False
    return _pick_th(H, W, Ci, Co) is not None
