"""Modulated convolution + E4S mask-guided (regional) style injection.

This file is the compute heart of the framework.

Background
----------
StyleGAN2's ModulatedConv2d scales the conv weight per-sample by a style
vector over input channels and re-normalises ("demodulates") per output
channel (ref: src/models/stylegan2/model.py:184-320). E4S's twist: for the
first K layers the conv is evaluated *once per facial region r* with that
region's style, and the outputs are summed under the one-hot region mask
(ref: src/models/stylegan2/model.py:386-400, 426-439):

    out = sum_r  M_r  *  d_r  *  conv(x * s_r, W)          (12 regions)

The reference literally runs 12 convolutions per masked layer — 12x the FLOPs
and the dominant cost of the whole network.

TPU-native factorisation (exact, 1x FLOPs)
------------------------------------------
The region masks are a *disjoint partition* (one-hot stays one-hot under
nearest resize): every output pixel p belongs to exactly one region r(p).
Hence the masked sum collapses pointwise:

    out[o,p] = d_{r(p)}[o] * sum_{i,t} W[o,i,t] * s_{r(p)}[i] * x[i, p+t]

Define per-pixel modulation/demodulation maps gathered at the *output* pixel:

    smap[i,p] = sum_r M_r[p] s_r[i]        dmap[o,p] = sum_r M_r[p] d_r[o]

Then the whole masked layer is ONE conv's worth of work: 9 shifted
(smap * shift(x)) @ W_tap matmuls accumulated, times dmap. This is exactly
equal (not an approximation) to the 12-conv reference loop, because the
modulation of the *entire 3x3 patch* uses the output pixel's region — which
is what the per-region conv + masked-sum computes.

For upsampling layers the conv is conv_transpose(stride 2) followed by a FIR
blur (ref: model.py:287-300). The composite map is linear with stride-2
structure, so it splits into 4 polyphase 3x3 kernels (computed from W and the
blur taps); each phase then reduces to the same patch-modulated conv, and the
phases interleave back to the 2x resolution. Again exact.

A fused Pallas kernel for the patch-modulated conv lives in
``e4s_tpu.ops.pallas.modconv_tpu``; the NHWC (channels-last) path below
dispatches to it on TPU whenever the shape fits its tiling (see
``_patch_mod_conv_nhwc``), with gradients routed through the mathematically
identical XLA formulation via custom_vjp. This file also provides the XLA
reference paths (NCHW and NHWC) and the region-batched "naive" path used to
cross-check everything in tests.
"""

from __future__ import annotations

import math
import functools
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from e4s_tpu.ops import conv as convops
from e4s_tpu.ops.resize import nearest_resize
from e4s_tpu.ops.upfirdn2d import make_kernel, upfirdn2d

DEMOD_EPS = 1e-8


# ---------------------------------------------------------------------------
# Plain (non-masked) modulated conv — used by layers >= K and by GPEN.
# ---------------------------------------------------------------------------


def demod_coeff(w_scaled: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Demodulation coefficients.

    w_scaled: [Co, Ci, kh, kw] (equalised-lr scale already applied)
    s:        [..., Ci] modulation (output of the style EqualLinear)
    returns:  [..., Co] = rsqrt(sum_{i,k} (w*s)^2 + eps)

    ref: src/models/stylegan2/model.py:279-281
    """
    # sum_k w^2 -> [Co, Ci]; then contract s^2 over Ci.
    w2 = jnp.sum(w_scaled.astype(jnp.float32) ** 2, axis=(-2, -1))
    sig2 = jnp.einsum("oi,...i->...o", w2, s.astype(jnp.float32) ** 2)
    return lax.rsqrt(sig2 + DEMOD_EPS)


def modulated_conv2d(
    x: jnp.ndarray,
    w_scaled: jnp.ndarray,
    s: jnp.ndarray,
    *,
    demodulate: bool = True,
    up: bool = False,
    down: bool = False,
    blur_kernel=(1, 3, 3, 1),
    up_polyphase: bool = False,
) -> jnp.ndarray:
    """StyleGAN2 modulated conv, fused-path semantics.

    x: [B, Ci, H, W];  w_scaled: [Co, Ci, k, k];  s: [B, Ci].

    Uses the input-scaling identity conv(x, W*s) == conv(x*s, W) so the weight
    stays shared across the batch (no grouped conv needed on TPU).

    ref: src/models/stylegan2/model.py:276-320
    """
    ksize = w_scaled.shape[-1]
    xm = x * s[:, :, None, None].astype(x.dtype)

    if up:
        # conv_transpose(stride 2) then blur (ref: model.py:287-300). The
        # polyphase fold (4 phase convs, exact) is available behind
        # up_polyphase but measured SLOWER than convT+blur on v5e at the
        # 512-channel tail (34 vs 40 swaps/s end to end): the 4 phase convs
        # re-read x and XLA's fused convT is already strong. Kept off.
        if up_polyphase and ksize == 3 and len(blur_kernel) == 4:
            bk = make_kernel(blur_kernel) * 4.0
            E = _composite_up_kernel(w_scaled, bk)  # [Co,Ci,6,6]
            B, Ci, H, W = x.shape
            Co = w_scaled.shape[0]
            phases = []
            for a in (0, 1):
                row = []
                for b in (0, 1):
                    Kab = E[:, :, (a + 4, a + 2, a), :][:, :, :, (b + 4, b + 2, b)]
                    row.append(convops.conv2d(xm, Kab, padding=1))
                phases.append(row)
            out = jnp.stack(
                [jnp.stack(r, axis=-1) for r in phases], axis=-3
            ).reshape(B, Co, H, 2, W, 2).reshape(B, Co, 2 * H, 2 * W)
            if demodulate:
                d = demod_coeff(w_scaled, s)
                out = out * d[:, :, None, None].astype(out.dtype)
            return out
        out = convops.conv_transpose2d(
            xm, jnp.swapaxes(w_scaled, 0, 1), stride=2, padding=0
        )
        p = (len(blur_kernel) - 2) - (ksize - 1)
        pad0 = (p + 1) // 2 + 1
        pad1 = p // 2 + 1
        k = make_kernel(blur_kernel) * 4.0
        if demodulate:
            d = demod_coeff(w_scaled, s)
            out = out * d[:, :, None, None].astype(out.dtype)
        out = upfirdn2d(out, k, pad=(pad0, pad1))
        return out

    if down:
        p = (len(blur_kernel) - 2) + (ksize - 1)
        pad0 = (p + 1) // 2
        pad1 = p // 2
        k = make_kernel(blur_kernel)
        xm = upfirdn2d(xm, k, pad=(pad0, pad1))
        out = convops.conv2d(xm, w_scaled, stride=2, padding=0)
    else:
        out = convops.conv2d(xm, w_scaled, padding=ksize // 2)

    if demodulate:
        d = demod_coeff(w_scaled, s)
        out = out * d[:, :, None, None].astype(out.dtype)
    return out


# ---------------------------------------------------------------------------
# Region-batched "naive" path — reference semantics made jittable by folding
# the region loop into the batch axis. Used for cross-checks and as fallback.
# ---------------------------------------------------------------------------


def masked_modulated_conv2d_naive(
    x, w_scaled, s, mask, *, demodulate=True, up=False, blur_kernel=(1, 3, 3, 1)
):
    """sum_r M_r * modconv(x, s_r) with the region loop folded into batch.

    x: [B,Ci,H,W]; s: [B,R,Ci]; mask: [B,R,Hm,Wm] one-hot at full image res.
    ref: src/models/stylegan2/model.py:386-400
    """
    B, R, Ci = s.shape
    H, W = x.shape[-2:]
    Ho, Wo = (H * 2, W * 2) if up else (H, W)
    xt = jnp.broadcast_to(x[:, None], (B, R) + x.shape[1:]).reshape((B * R,) + x.shape[1:])
    st = s.reshape(B * R, Ci)
    # up_polyphase=False: keep the reference convT+blur formulation so this
    # path stays an independent oracle for the factorised/polyphase ones.
    out = modulated_conv2d(
        xt, w_scaled, st, demodulate=demodulate, up=up,
        blur_kernel=blur_kernel, up_polyphase=False,
    )
    out = out.reshape(B, R, -1, Ho, Wo)
    seg = nearest_resize(mask, (Ho, Wo)).astype(out.dtype)
    return jnp.einsum("brohw,brhw->bohw", out, seg)


# ---------------------------------------------------------------------------
# Exact factorised fast path.
# ---------------------------------------------------------------------------


def _patch_mod_conv(x, w, smap, dmap):
    """out[o,p] = dmap[o,p] * sum_{i,t} w[o,i,t] smap[i,p] x[i,p+t-c].

    x, smap: [B,Ci,H,W]; w: [Co,Ci,k,k] (odd k); dmap: [B,Co,H,W] or None.
    The modulation smap is gathered at the *output* pixel (patch-wise), which
    is what makes this equal to the per-region conv + one-hot masked sum.
    """
    B, Ci, H, W = x.shape
    Co, _, kh, kw = w.shape
    ph, pw = kh // 2, kw // 2
    xp = jnp.pad(x, ((0, 0), (0, 0), (ph, ph), (pw, pw)))
    acc = jnp.zeros((B, Co, H, W), dtype=jnp.promote_types(x.dtype, jnp.float32))
    for ty in range(kh):
        for tx in range(kw):
            xs = lax.slice(xp, (0, 0, ty, tx), (B, Ci, ty + H, tx + W))
            acc = acc + jnp.einsum(
                "bihw,oi->bohw",
                smap * xs,
                w[:, :, ty, tx],
                preferred_element_type=acc.dtype,
            )
    if dmap is not None:
        acc = acc * dmap
    return acc.astype(x.dtype)


def _region_maps(mask, s, d, out_hw, dtype):
    """Per-pixel style/demod maps gathered at output pixels.

    mask: [B,R,Hm,Wm] one-hot; s: [B,R,Ci]; d: [B,R,Co] or None.
    Returns smap [B,Ci,H,W], dmap [B,Co,H,W] (or None).
    """
    seg = nearest_resize(mask, out_hw).astype(dtype)
    smap = jnp.einsum("brhw,bri->bihw", seg, s.astype(dtype))
    dmap = None
    if d is not None:
        dmap = jnp.einsum("brhw,bro->bohw", seg, d.astype(dtype))
    return smap, dmap


def masked_modulated_conv2d(
    x, w_scaled, s, mask, *, demodulate=True, up=False, blur_kernel=(1, 3, 3, 1)
):
    """Exact fast path for the mask-guided modulated conv (see module doc).

    Equals :func:`masked_modulated_conv2d_naive` bit-for-bit in exact
    arithmetic; verified to ~1e-5 in float32 by tests/test_modconv.py.
    """
    B, R, Ci = s.shape
    H, W = x.shape[-2:]
    d = demod_coeff(w_scaled, s) if demodulate else None

    if not up:
        smap, dmap = _region_maps(mask, s, d, (H, W), x.dtype)
        return _patch_mod_conv(x, w_scaled, smap, dmap)

    # Upsampling layer: decompose blur(convT2(x*s, W^T)) into 4 polyphase
    # 3x3 kernels of the composite (convT x blur) map, then run the same
    # patch-modulated conv per phase and interleave.
    ksize = w_scaled.shape[-1]
    p = (len(blur_kernel) - 2) - (ksize - 1)
    pad0 = (p + 1) // 2 + 1
    pad1 = p // 2 + 1
    assert (pad0, pad1) == (1, 1) and ksize == 3 and len(blur_kernel) == 4, (
        "polyphase fast path is specialised to k=3, blur len 4 (the only "
        "configuration StyleGAN2 uses); fall back to naive otherwise"
    )
    bk = make_kernel(blur_kernel) * 4.0  # upsample gain (ref: model.py:84-85)

    # Composite kernel E[o,i,c] = sum_s B[s] * W[o,i,c+2-s], c in [-2,3]+2.
    # This is a "full" convolution of W with B.
    E = _composite_up_kernel(w_scaled, bk)  # [Co,Ci,6,6]

    seg_full = nearest_resize(mask, (2 * H, 2 * W))
    phases = []
    for a in (0, 1):
        row = []
        for b in (0, 1):
            # phase kernel K_ab[t] = E[a+4-2t], t in {0,1,2}
            Kab = E[:, :, (a + 4, a + 2, a), :][:, :, :, (b + 4, b + 2, b)]
            seg_ab = seg_full[:, :, a::2, b::2]
            sm = jnp.einsum("brhw,bri->bihw", seg_ab.astype(x.dtype), s.astype(x.dtype))
            dm = (
                jnp.einsum("brhw,bro->bohw", seg_ab.astype(x.dtype), d.astype(x.dtype))
                if d is not None
                else None
            )
            row.append(_patch_mod_conv(x, Kab, sm, dm))
        phases.append(row)

    # Interleave: out[2n+a, 2m+b] = phases[a][b][n, m].
    Co = w_scaled.shape[0]
    out = jnp.stack([jnp.stack(r, axis=-1) for r in phases], axis=-3)
    # out: [B,Co,H,2a? ...] -> axes [B,Co,H,a,W,b]
    out = out.reshape(B, Co, H, 2, W, 2)
    return out.reshape(B, Co, 2 * H, 2 * W)


def _composite_up_kernel(w_scaled, bk):
    """E[o,i,cy+2,cx+2] = sum_{sy,sx} bk[sy,sx] * w[o,i,cy+2-sy,cx+2-sx].

    Full 2-D convolution of the 3x3 conv weight with the 4x4 blur taps,
    giving the 6x6 composite kernel of blur∘conv_transpose2 (per phase pair
    this slices into four 3x3 polyphase kernels).
    """
    Co, Ci, kh, kw = w_scaled.shape
    bh, bw = bk.shape
    # full conv via conv_general_dilated: pad w by (bh-1, bw-1) and correlate
    # with the flipped blur kernel.
    wf = w_scaled.reshape(Co * Ci, 1, kh, kw)
    flt = jnp.flip(bk, (0, 1)).astype(w_scaled.dtype)[None, None]
    E = lax.conv_general_dilated(
        wf,
        flt,
        window_strides=(1, 1),
        padding=((bh - 1, bh - 1), (bw - 1, bw - 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return E.reshape(Co, Ci, kh + bh - 1, kw + bw - 1)


# ---------------------------------------------------------------------------
# NHWC (channels-last) path — the TPU-preferred layout. Keeping the synthesis
# activations channels-last makes every tap contraction a [B·H·W, Ci] @
# [Ci, Co] matmul on contiguous data and lets the fused Pallas kernel consume
# activations directly (no NCHW<->NHWC boundary transposes, which is what made
# the round-1 kernel a 0.92x loss). Weights stay torch-OIHW everywhere; the
# tiny weight transposes happen at call sites.
# ---------------------------------------------------------------------------


def _pallas_wanted() -> bool:
    """Dispatch switch for the fused Pallas masked-conv kernel.

    E4S_TPU_PALLAS=0 disables, =1 forces (real kernel), =interpret forces the
    interpreter (for CPU tests); default: enabled on the TPU backend.
    """
    v = os.environ.get("E4S_TPU_PALLAS", "")
    if v == "0":
        return False
    if v in ("1", "interpret"):
        return True
    # honour jax.default_device(cpu) contexts (e.g. the bench CPU baseline):
    # the default *backend* still reports tpu there, but lowering the kernel
    # for CPU would fail
    dd = jax.config.jax_default_device
    if dd is not None and getattr(dd, "platform", None) != "tpu":
        return False
    return jax.default_backend() == "tpu"


def _patch_mod_conv_nhwc_xla(x, w, smap, dmap):
    """NHWC twin of :func:`_patch_mod_conv`.

    x, smap: [B,H,W,Ci]; w: [Co,Ci,k,k] (odd k); dmap: [B,H,W,Co] or None.
    """
    B, H, W, Ci = x.shape
    Co, _, kh, kw = w.shape
    ph, pw = kh // 2, kw // 2
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    acc = jnp.zeros((B, H, W, Co), dtype=jnp.promote_types(x.dtype, jnp.float32))
    for ty in range(kh):
        for tx in range(kw):
            xs = lax.slice(xp, (0, ty, tx, 0), (B, ty + H, tx + W, Ci))
            acc = acc + jnp.einsum(
                "bhwi,io->bhwo",
                smap * xs,
                w[:, :, ty, tx].T,
                preferred_element_type=acc.dtype,
            )
    if dmap is not None:
        acc = acc * dmap
    return acc.astype(x.dtype)


@jax.custom_vjp
def _patch_mod_conv_nhwc_pallas(x, w, smap, dmap):
    """Fused Pallas forward; gradients flow through the XLA formulation.

    The kernel is forward-only by design: training differentiates the
    mathematically identical XLA einsum path (custom_vjp below), so the
    Coach's G/D/R1 steps need no Pallas-specific autodiff rules.
    """
    from e4s_tpu.ops.pallas.modconv_tpu import patch_mod_conv3_nhwc

    interpret = os.environ.get("E4S_TPU_PALLAS") == "interpret"
    return patch_mod_conv3_nhwc(x, w, smap, dmap, interpret=interpret)


def _pmc_fwd(x, w, smap, dmap):
    return _patch_mod_conv_nhwc_pallas(x, w, smap, dmap), (x, w, smap, dmap)


def _pmc_bwd(res, g):
    _, vjp = jax.vjp(_patch_mod_conv_nhwc_xla, *res)
    return vjp(g)


_patch_mod_conv_nhwc_pallas.defvjp(_pmc_fwd, _pmc_bwd)


def _patch_mod_conv_nhwc(x, w, smap, dmap):
    """Layout-local dispatch: fused Pallas kernel when the tiling supports the
    shape (W multiple of 128, feasible VMEM), XLA einsum path otherwise."""
    from e4s_tpu.ops.pallas.modconv_tpu import pallas_supported_shape

    B, H, W, Ci = x.shape
    Co = w.shape[0]
    if (
        dmap is not None
        and w.shape[-1] == 3
        and _pallas_wanted()
        and pallas_supported_shape(H, W, Ci, Co)
    ):
        return _patch_mod_conv_nhwc_pallas(x, w, smap, dmap)
    return _patch_mod_conv_nhwc_xla(x, w, smap, dmap)


def _region_maps_nhwc(mask, s, d, out_hw, dtype):
    """NHWC twin of :func:`_region_maps` (smap [B,H,W,Ci], dmap [B,H,W,Co])."""
    seg = nearest_resize(mask, out_hw).astype(dtype)
    smap = jnp.einsum("brhw,bri->bhwi", seg, s.astype(dtype))
    dmap = None
    if d is not None:
        dmap = jnp.einsum("brhw,bro->bhwo", seg, d.astype(dtype))
    return smap, dmap


def masked_modulated_conv2d_nhwc(
    x, w_scaled, s, mask, *, demodulate=True, up=False, blur_kernel=(1, 3, 3, 1)
):
    """NHWC twin of :func:`masked_modulated_conv2d` (same math, same tests).

    x: [B,H,W,Ci]; w_scaled: [Co,Ci,k,k]; s: [B,R,Ci]; mask: [B,R,Hm,Wm].
    """
    B, R, Ci = s.shape
    H, W = x.shape[1:3]
    d = demod_coeff(w_scaled, s) if demodulate else None

    if not up:
        smap, dmap = _region_maps_nhwc(mask, s, d, (H, W), x.dtype)
        return _patch_mod_conv_nhwc(x, w_scaled, smap, dmap)

    ksize = w_scaled.shape[-1]
    p = (len(blur_kernel) - 2) - (ksize - 1)
    pad0 = (p + 1) // 2 + 1
    pad1 = p // 2 + 1
    assert (pad0, pad1) == (1, 1) and ksize == 3 and len(blur_kernel) == 4, (
        "polyphase fast path is specialised to k=3, blur len 4 (the only "
        "configuration StyleGAN2 uses)"
    )
    bk = make_kernel(blur_kernel) * 4.0
    E = _composite_up_kernel(w_scaled, bk)  # [Co,Ci,6,6]

    seg_full = nearest_resize(mask, (2 * H, 2 * W))
    phases = []
    for a in (0, 1):
        row = []
        for b in (0, 1):
            Kab = E[:, :, (a + 4, a + 2, a), :][:, :, :, (b + 4, b + 2, b)]
            seg_ab = seg_full[:, :, a::2, b::2].astype(x.dtype)
            sm = jnp.einsum("brhw,bri->bhwi", seg_ab, s.astype(x.dtype))
            dm = (
                jnp.einsum("brhw,bro->bhwo", seg_ab, d.astype(x.dtype))
                if d is not None
                else None
            )
            row.append(_patch_mod_conv_nhwc(x, Kab, sm, dm))
        phases.append(row)

    # Interleave: out[:, 2n+a, 2m+b, :] = phases[a][b][:, n, m, :].
    Co = w_scaled.shape[0]
    out = jnp.stack([jnp.stack(r, axis=3) for r in phases], axis=2)
    # axes: [B, H, a, W, b, Co]
    return out.reshape(B, 2 * H, 2 * W, Co)


def _up_stacked_wanted() -> bool:
    """Dispatch switch for the stacked-polyphase unmasked up-conv
    (E4S_TPU_UP_STACKED=1 enables; default OFF). The dense [4Co,Ci,3,3]
    conv trades 4x MACs for full-lane MXU contractions and drops the convT
    zero-stuffing + depthwise blur passes — but an interleaved A/B on v5e
    (scripts/ab_synthesis.py, 1024² bf16 synthesis) measured it at 16.36ms
    vs 15.79ms for convT+blur across all rounds, so XLA's convT lowering
    wins and this stays an opt-in."""
    return os.environ.get("E4S_TPU_UP_STACKED", "") == "1"


def modulated_conv2d_nhwc(
    x, w_scaled, s, *, demodulate=True, up=False, down=False,
    blur_kernel=(1, 3, 3, 1),
):
    """NHWC twin of :func:`modulated_conv2d` (shared-style layers >= K).

    x: [B,H,W,Ci]; w_scaled: [Co,Ci,k,k]; s: [B,Ci].
    """
    ksize = w_scaled.shape[-1]
    xm = x * s[:, None, None, :].astype(x.dtype)

    if up:
        if ksize == 3 and len(blur_kernel) == 4 and _up_stacked_wanted():
            # Stacked polyphase: blur∘convT(stride 2) == 4 3x3 phase kernels
            # of the 6x6 composite (see masked_modulated_conv2d). Stacking
            # the phases along Co turns the whole upsample into ONE stride-1
            # conv [B,H,W,Ci] -> [B,H,W,4Co] + a depth-to-space reshape —
            # no zero-stuffed conv_transpose, no separate depthwise blur
            # pass, and the MXU contraction stays at Ci (the tail octaves'
            # convT would otherwise run at Co=64/32 output lanes).
            return depth_to_space2(
                modulated_conv2d_nhwc_up_packed(
                    x, w_scaled, s, demodulate=demodulate,
                    blur_kernel=blur_kernel,
                )
            )
        out = convops.conv_transpose2d(
            xm, jnp.swapaxes(w_scaled, 0, 1), stride=2, padding=0,
            channels_last=True,
        )
        p = (len(blur_kernel) - 2) - (ksize - 1)
        pad0 = (p + 1) // 2 + 1
        pad1 = p // 2 + 1
        k = make_kernel(blur_kernel) * 4.0
        if demodulate:
            d = demod_coeff(w_scaled, s)
            out = out * d[:, None, None, :].astype(out.dtype)
        return upfirdn2d(out, k, pad=(pad0, pad1), channels_last=True)

    if down:
        p = (len(blur_kernel) - 2) + (ksize - 1)
        pad0 = (p + 1) // 2
        pad1 = p // 2
        k = make_kernel(blur_kernel)
        xm = upfirdn2d(xm, k, pad=(pad0, pad1), channels_last=True)
        out = convops.conv2d(xm, w_scaled, stride=2, padding=0, channels_last=True)
    else:
        out = convops.conv2d(xm, w_scaled, padding=ksize // 2, channels_last=True)

    if demodulate:
        d = demod_coeff(w_scaled, s)
        out = out * d[:, None, None, :].astype(out.dtype)
    return out


# ---------------------------------------------------------------------------
# Packed (space-to-depth) tail domain.
#
# At the 1024^2 octave the generator runs 32-channel NHWC convs; XLA:TPU pads
# the lane (channel) dimension to 128, so those layers read/write 4x the
# bytes their data needs and the octave is ~2.3x off the equivalent dense
# 128-lane conv (measured: 3x3 conv at [1,1024,1024,32] 2.72ms vs the same
# math packed as [1,512,512,128] 1.20ms on v5e, chained in-program). The fix
# is to run the whole final octave in the space-to-depth domain: half the
# spatial extent, 4x the channels (phase-major (a,b), original channel
# minor), one depth-to-space at the very end. Every op below is EXACT — the
# packing is a relabeling of the same math:
#   - the upsampling modconv already decomposes into 4 polyphase 3x3 kernels
#     (see masked_modulated_conv2d); emitting them stacked along Co *is* the
#     packed output.
#   - a stride-1 3x3 conv on [2H,2W] becomes a 3x3 conv on [H,W] with a
#     [4Co,4Ci] kernel whose (phase_out, phase_in) blocks are the original
#     taps rearranged (structured zeros; 4x dense MACs, but the MXU has the
#     headroom and HBM traffic drops 4x).
#   - ToRGB (1x1) acts per phase; the skip 2x-upsample's polyphase form is a
#     tiny 3x3 conv emitting all 4 phases.
# ---------------------------------------------------------------------------


def packed_tail_min_res() -> int:
    """Octave output resolution at which the packed tail engages (default
    1024 — measured win only where channels drop to 32; 512^2/64ch is a
    wash). Tests lower it via E4S_TPU_PACKED_MIN_RES to exercise the path
    on tiny generators."""
    return int(os.environ.get("E4S_TPU_PACKED_MIN_RES", "1024"))


def packed_tail_wanted() -> bool:
    """E4S_TPU_PACKED_TAIL=0 disables, =1 forces; default: TPU backend
    (the lane-padding economics are TPU-specific)."""
    v = os.environ.get("E4S_TPU_PACKED_TAIL", "")
    if v == "0":
        return False
    if v == "1":
        return True
    dd = jax.config.jax_default_device
    if dd is not None and getattr(dd, "platform", None) != "tpu":
        return False
    return jax.default_backend() == "tpu"


# For small per-phase channel counts (the C=3 RGB heads/tails) the
# reshape+transpose relabeling's BACKWARD materialises 6-D cotangent
# tensors whose tiny minor dims XLA:TPU tiles at 21x padding (a 48 MB RGB
# grad became a 1.00 G HLO temp in the B=8 training step). The forward
# relabeling is free (XLA fuses it into neighbours), so the forward keeps
# it; a custom_vjp routes only the BACKWARD through an identity-kernel
# stride-2 conv (4-D layouts, exact permutation, negligible FLOPs).
# A conv FORWARD was tried first and regressed the B=4 train step 9.5 ->
# 5.5 img/s — hence the fwd-reshape/bwd-conv split. Wide-channel cases
# keep plain autodiff.
_S2D_CONV_MAX_C = 8


@functools.lru_cache(maxsize=None)
def _s2d_kernel_np(C: int):
    """[2,2,C,4C] identity kernel: out ch (a*2+b)*C+c takes tap (a,b), ch c.

    Cached as NUMPY (converted per call site): caching a jnp array would
    leak a traced constant across jit scopes (UnexpectedTracerError)."""
    k = np.zeros((2, 2, C, 4 * C), np.float32)
    for a in range(2):
        for b in range(2):
            for c in range(C):
                k[a, b, c, (a * 2 + b) * C + c] = 1.0
    return k


def _s2d_kernel(C: int, dtype_name: str):
    return jnp.asarray(_s2d_kernel_np(C), dtype=jnp.dtype(dtype_name))


def _s2d_conv(x):
    """space_to_depth2 as a stride-2 conv. HIGHEST precision: the TPU's
    default bf16 conv multiply would ROUND f32 data through an identity
    permutation."""
    C = x.shape[-1]
    return lax.conv_general_dilated(
        x, _s2d_kernel(C, x.dtype.name), (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST,
    )


def _d2s_conv(x):
    """depth_to_space2 as the adjoint conv (transpose_kernel=True: the exact
    adjoint of the s2d conv — a permutation, so adjoint == inverse)."""
    C = x.shape[-1] // 4
    return lax.conv_transpose(
        x, _s2d_kernel(C, x.dtype.name), (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=True,
        precision=lax.Precision.HIGHEST,
    )


def _s2d_reshape(x):
    B, H2, W2, C = x.shape
    H, W = H2 // 2, W2 // 2
    x = x.reshape(B, H, 2, W, 2, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [B,H,W,a,b,C]
    return x.reshape(B, H, W, 4 * C)


def _d2s_reshape(x):
    B, H, W, C4 = x.shape
    C = C4 // 4
    x = x.reshape(B, H, W, 2, 2, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [B,H,a,W,b,C]
    return x.reshape(B, 2 * H, 2 * W, C)


@jax.custom_vjp
def _s2d_smallc(x):
    return _s2d_reshape(x)


_s2d_smallc.defvjp(
    lambda x: (_s2d_reshape(x), None),
    lambda _, g: (_d2s_conv(g),),  # adjoint of s2d == d2s (permutation)
)


@jax.custom_vjp
def _d2s_smallc(x):
    return _d2s_reshape(x)


_d2s_smallc.defvjp(
    lambda x: (_d2s_reshape(x), None),
    lambda _, g: (_s2d_conv(g),),
)


def _s2d_bwd_conv_wanted() -> bool:
    """E4S_TPU_S2D_BWD_CONV=0 reverts to plain reshape autodiff (A/B)."""
    return os.environ.get("E4S_TPU_S2D_BWD_CONV", "1") == "1"


def space_to_depth2(x):
    """[B,2H,2W,C] -> [B,H,W,4C], phase-major: out[..., (a*2+b)*C + c] =
    x[:, 2i+a, 2j+b, c]."""
    if x.shape[-1] <= _S2D_CONV_MAX_C and _s2d_bwd_conv_wanted():
        return _s2d_smallc(x)
    return _s2d_reshape(x)


def depth_to_space2(x):
    """Inverse of :func:`space_to_depth2`: [B,H,W,4C] -> [B,2H,2W,C]."""
    if x.shape[-1] // 4 <= _S2D_CONV_MAX_C and _s2d_bwd_conv_wanted():
        return _d2s_smallc(x)
    return _d2s_reshape(x)


def modulated_conv2d_nhwc_up_packed(
    x, w_scaled, s, *, demodulate=True, blur_kernel=(1, 3, 3, 1)
):
    """Upsampling modconv with PACKED output.

    x: [B,H,W,Ci] (unpacked); returns [B,H,W,4Co] == space_to_depth2 of the
    2x-upsampled result. This is the stacked-polyphase decomposition of
    blur∘convT(stride2) (exact; phase kernels of the 6x6 composite) without
    the final depth-to-space.
    """
    assert w_scaled.shape[-1] == 3 and len(blur_kernel) == 4
    xm = x * s[:, None, None, :].astype(x.dtype)
    bk = make_kernel(blur_kernel) * 4.0
    E = _composite_up_kernel(w_scaled, bk)  # [Co,Ci,6,6]
    K = jnp.concatenate(
        [
            E[:, :, (a + 4, a + 2, a), :][:, :, :, (b + 4, b + 2, b)]
            for a in (0, 1)
            for b in (0, 1)
        ],
        axis=0,
    )  # [4Co, Ci, 3, 3], phase-major (a,b), Co minor
    out = convops.conv2d(xm, K, padding=1, channels_last=True)
    if demodulate:
        d = demod_coeff(w_scaled, s)  # [B,Co]
        out = out * jnp.tile(d, (1, 4))[:, None, None, :].astype(out.dtype)
    return out


def _packed_stride1_kernel(w):
    """Packed-domain kernel for a stride-1 3x3 conv: [Co,Ci,3,3] ->
    [4Co,4Ci,3,3] OIHW with structured zeros.

    Output phase a, tap u of the original kernel reads original row
    2i+a+u-1 = packed row i+t of input phase c, where s=a+u-1, c=s mod 2,
    t=(s-c)//2 — i.e. packed tap index u'=t+1 of a SAME-padded 3x3 conv.
    The (a,u)->(u',c) map is injective per a, so this is a pure scatter.
    """
    Co, Ci, kh, kw = w.shape
    assert (kh, kw) == (3, 3)
    K = jnp.zeros((4, Co, 4, Ci, 3, 3), w.dtype)
    for a in (0, 1):
        for u in range(3):
            sa = a + u - 1
            ca, ta = sa % 2, (sa - (sa % 2)) // 2
            for b in (0, 1):
                for v in range(3):
                    sb = b + v - 1
                    cb, tb = sb % 2, (sb - (sb % 2)) // 2
                    K = K.at[a * 2 + b, :, ca * 2 + cb, :, ta + 1, tb + 1].set(
                        w[:, :, u, v]
                    )
    return K.reshape(4 * Co, 4 * Ci, 3, 3)


def modulated_conv2d_nhwc_packed(xp, w_scaled, s, *, demodulate=True):
    """Stride-1 3x3 modconv entirely in the packed domain.

    xp: [B,H,W,4Ci] (space_to_depth2 of [B,2H,2W,Ci]); returns [B,H,W,4Co].
    Exactly equals space_to_depth2(modulated_conv2d_nhwc(depth_to_space2(xp))).
    """
    xm = xp * jnp.tile(s, (1, 4))[:, None, None, :].astype(xp.dtype)
    K = _packed_stride1_kernel(w_scaled)
    out = convops.conv2d(xm, K, padding=1, channels_last=True)
    if demodulate:
        d = demod_coeff(w_scaled, s)
        out = out * jnp.tile(d, (1, 4))[:, None, None, :].astype(out.dtype)
    return out


def torgb_nhwc_packed(xp, w_scaled, s):
    """1x1 modulated conv (no demod) in the packed domain.

    xp: [B,H,W,4Ci]; returns [B,H,W,4*3] packed RGB. A 1x1 conv acts per
    phase, so this is one einsum over the channel-minor axis.
    """
    B, H, W, Ci4 = xp.shape
    Ci = Ci4 // 4
    xm = xp * jnp.tile(s, (1, 4))[:, None, None, :].astype(xp.dtype)
    w1 = w_scaled[:, :, 0, 0].T.astype(xp.dtype)  # [Ci, 3]
    out = jnp.einsum("bhwpi,io->bhwpo", xm.reshape(B, H, W, 4, Ci), w1)
    return out.reshape(B, H, W, 12)


def masked_torgb_nhwc(x, w_scaled, s, mask):
    """NHWC twin of :func:`masked_torgb` (1x1 modulated conv, no demod)."""
    H, W = x.shape[1:3]
    smap, _ = _region_maps_nhwc(mask, s, None, (H, W), x.dtype)
    return jnp.einsum(
        "bhwi,io->bhwo", smap * x, w_scaled[:, :, 0, 0].T.astype(x.dtype)
    )


def masked_torgb(x, w_scaled, s, mask):
    """Mask-guided ToRGB: 1x1 modulated conv, no demodulation.

    out[o,p] = sum_i w[o,i] * s_{r(p)}[i] * x[i,p]  — a single 1x1 conv on the
    pixelwise-modulated input. ref: src/models/stylegan2/model.py:426-439.
    x: [B,Ci,H,W]; w_scaled: [3,Ci,1,1]; s: [B,R,Ci]; mask: [B,R,Hm,Wm].
    """
    H, W = x.shape[-2:]
    smap, _ = _region_maps(mask, s, None, (H, W), x.dtype)
    return jnp.einsum(
        "bihw,oi->bohw", smap * x, w_scaled[:, :, 0, 0].astype(x.dtype)
    )
