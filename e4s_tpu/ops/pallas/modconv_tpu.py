"""Pallas TPU kernel for the patch-modulated 3x3 convolution.

This fuses the heart of E4S's mask-guided modulated conv (see
ops/modconv.py's module docstring for the math): per output row-band it

  1. reads one aligned row band of the width-padded input plus a tiny
     2-row "halo" operand (the first two rows of the next band, gathered
     once by XLA — the axon runtime does not support arbitrary-offset
     halo DMA from HBM refs, and aligned band + explicit halo keeps the
     prep traffic at 2/TH of x instead of the 3x row-shifted copies the
     round-1 kernel paid),
  2. accumulates the nine shifted (smap * x_shift) @ W_tap matmuls on the
     MXU in f32 without materialising any of the nine modulated copies,
  3. applies the per-pixel demodulation epilogue in-register.

The XLA path materialises the nine modulated [B,H,W,Ci] intermediates in
HBM (or re-reads x/smap per tap when it fuses); the kernel's traffic is
~1x read of x + smap + dmap + one write.

Layout: NHWC (channels on lanes). The generator's synthesis path runs
channels-last end-to-end, so ``patch_mod_conv3_nhwc`` consumes activations
directly with no boundary transposes; a legacy NCHW wrapper
(``patch_mod_conv3``) transposes at the boundary for layout cross-checks.
Dispatch (shape gating, grad routing via custom_vjp) lives in
``e4s_tpu.ops.modconv._patch_mod_conv_nhwc``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, halo_ref, smap_ref, dmap_ref, w_ref, out_ref, *, TH, W, Ci, Co):
    # x_ref block: [1, TH, W+2, Ci] — aligned band of the width-padded input
    # halo_ref:    [1, 1, 2, W+2, Ci] — rows TH, TH+1 relative to band start
    xfull = jnp.concatenate([x_ref[0], halo_ref[0, 0]], axis=0)  # [TH+2, W+2, Ci]
    smap = smap_ref[0]  # [TH, W, Ci]
    acc = jnp.zeros((TH * W, Co), dtype=jnp.float32)
    for ty in range(3):
        xband = xfull[ty : ty + TH]  # [TH, W+2, Ci]
        for tx in range(3):
            xs = xband[:, tx : tx + W, :]
            mod = (xs * smap).reshape(TH * W, Ci)
            acc = acc + jnp.dot(
                mod,
                w_ref[(ty * 3 + tx) * Ci : (ty * 3 + tx + 1) * Ci, :],
                preferred_element_type=jnp.float32,
            )
    out = acc.reshape(TH, W, Co)
    out_ref[0] = (out * dmap_ref[0].astype(jnp.float32)).astype(out_ref.dtype)


def _pick_th(H, W, Ci, Co, itemsize=4):
    if W % 8 != 0 or Ci % 8 != 0:
        return None
    for th in (16, 8):
        if H % th == 0:
            vmem = (
                itemsize * (
                    2 * (th + 2) * (W + 2) * Ci  # band + halo (double buffered)
                    + 2 * th * W * (Ci + 2 * Co)  # smap + dmap + out (buffered)
                    + 9 * Ci * Co                # weights
                )
                + 4 * th * W * (Ci + Co)         # mod + acc temps (f32)
            )
            # Mosaic's real allocation runs ~1.4x this estimate (measured
            # 17.45M compiled vs 12.8M estimated for the f32 256-ch/128^2
            # case); _run raises the compiler's scoped-vmem limit to 32M
            # (default 16M; v5e has headroom beyond it), so a 13M estimate
            # lands ~18M actual with margin.
            if vmem < 13 * 1024 * 1024:
                return th
    return None


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run(xp, halo, smap, dmap, w9, *, interpret=False):
    B, H, Wp, Ci = xp.shape
    W = Wp - 2
    Co = w9.shape[1]
    TH = _pick_th(H, W, Ci, Co, itemsize=xp.dtype.itemsize)
    kernel = functools.partial(_kernel, TH=TH, W=W, Ci=Ci, Co=Co)
    return pl.pallas_call(
        kernel,
        grid=(B, H // TH),
        compiler_params=pltpu.CompilerParams(
            # raise the scoped-vmem cap above the 16M default: the batched
            # f32 case allocates ~17.5M and the chip has the headroom
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        in_specs=[
            pl.BlockSpec(
                (1, TH, Wp, Ci), lambda b, i: (b, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 2, Wp, Ci), lambda b, i: (b, i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, TH, W, Ci), lambda b, i: (b, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, TH, W, Co), lambda b, i: (b, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w9 replicated
        ],
        out_specs=pl.BlockSpec(
            (1, TH, W, Co), lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Co), x_dtype_of(xp, smap)),
        interpret=interpret,
    )(xp, halo, smap, dmap, w9)


def x_dtype_of(x, smap):
    return jnp.promote_types(x.dtype, smap.dtype)


def patch_mod_conv3_nhwc(x, w, smap, dmap, interpret=False):
    """NHWC entry — the native layout; no boundary transposes.

    x, smap: [B,H,W,Ci]; w: [Co,Ci,3,3]; dmap: [B,H,W,Co] or None.
    """
    B, H, W, Ci = x.shape
    Co = w.shape[0]
    TH = _pick_th(H, W, Ci, Co, itemsize=x.dtype.itemsize)
    # width-pad by 1 (kernel slides taps in VMEM); height halos are supplied
    # as a separate aligned operand: band i needs padded rows
    # [i*TH, i*TH+TH+2) and its block covers [i*TH, i*TH+TH).
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))  # [B, H+2, W+2, Ci]
    nH = H // TH
    idx = np.minimum(
        (np.arange(1, nH + 1) * TH)[:, None] + np.arange(2)[None, :], H + 1
    )  # [nH, 2] rows TH, TH+1 relative to each band start
    halo = xp[:, idx.reshape(-1)].reshape(B, nH, 2, W + 2, Ci)
    xp = xp[:, :H]  # aligned TH-row bands start at padded row 0
    if dmap is None:
        dmap = jnp.ones((B, H, W, Co), smap.dtype)
    w9 = jnp.transpose(w, (2, 3, 1, 0)).reshape(9 * Ci, Co)
    return _run(xp, halo, smap, dmap, w9, interpret=interpret)


def patch_mod_conv3(x, w, smap, dmap, interpret=False):
    """NCHW wrapper matching ops.modconv._patch_mod_conv's contract.

    x, smap: [B,Ci,H,W]; w: [Co,Ci,3,3]; dmap: [B,Co,H,W] or None.
    """
    out = patch_mod_conv3_nhwc(
        jnp.transpose(x, (0, 2, 3, 1)),
        w,
        jnp.transpose(smap, (0, 2, 3, 1)),
        None if dmap is None else jnp.transpose(dmap, (0, 2, 3, 1)),
        interpret=interpret,
    )
    return jnp.transpose(out, (0, 3, 1, 2))


def pallas_supported_shape(H: int, W: int, Ci: int, Co: int) -> bool:
    """Dispatch gate: tiling/VMEM feasibility + lane-efficient channels.

    Ci/Co multiples of 128 keep the [.., Ci] lane dimension fully packed
    (all masked generator layers at >=128^2 qualify: Ci, Co in
    {128, 256, 512}); smaller channel counts would waste most of each
    VMEM lane tile, where the XLA path is already fine.

    E4S_TPU_PALLAS_LANE_MIN=64 opt-in extends the gate to the 64-channel
    512^2 masked octave (half-packed lanes, K=64 matmuls). Interleaved
    synthesis A/B on v5e (round 5, bf16 batch-4 @1024², 4x15 iters):
    44.878 ms (128-gate) vs 44.826 ms (64-gate) min-of-means — a 0.1%
    WASH, so 128 stays the default per the measured-positive-only rule;
    the knob remains for re-measurement on other chips (see DESIGN.md).
    """
    import os

    lane_min = int(os.environ.get("E4S_TPU_PALLAS_LANE_MIN", "128"))
    if W < 128 or H < 8 or Ci % lane_min != 0 or Co % lane_min != 0:
        return False
    return _pick_th(H, W, Ci, Co) is not None
