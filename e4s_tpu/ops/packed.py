"""Packed (space-to-depth) domain for PLAIN convs — discriminator head etc.

XLA:TPU pads the NHWC channel (lane) dimension to 128, so any conv with
fewer than 128 channels reads/writes more bytes than its data needs. The
generator's final octave solves this for *modulated* convs
(``e4s_tpu.ops.modconv`` packed-domain section); this module is the same
relabeling for plain equalised-lr convs, used by the discriminator head
(ref: src/models/stylegan2/model.py:740-799 — its 32/64-channel blocks at
1024^2/512^2 are the D's hot spot on TPU).

Conventions (shared with modconv): packed tensors are NHWC [B, H, W, 4C]
with phase-major channel layout — packed[..., (ay*2+ax)*C + c] ==
unpacked[:, 2i+ay, 2j+ax, c]. Weights stay torch OIHW. Every op here is an
EXACT relabeling of the unpacked math (see tests/test_packed.py).

Key fact used throughout: an element of the unpacked grid at row m lives at
packed row q = (m - c) // 2, phase c = m mod 2 — so any fixed-stride conv
tap pattern on the unpacked grid becomes a (smaller) conv tap pattern on
the packed grid with per-phase scattered weights:

- stride-1 SAME conv (odd k): output phase a, tap u reads s = a + u - k//2
  -> 4x-dense [4Co, 4Ci, kp, kp] kernel (kp = 3 for k = 3; structured
  zeros trade 4x MACs for 4x less HBM traffic and full 128 lanes).
- blur + stride-2 VALID conv (the D's downsample ladder): the FIR and the
  conv fold into one composite stride-2 kernel E[t] = sum_{u+j=t} w[u]
  kf[j], which on the packed grid is a stride-1 conv [Co, 4Ci, 3, 3] with
  NO structured zeros (6 composite taps = 2 phases x 3 packed taps) —
  MAC-neutral with the composite, and it absorbs the separate blur pass.
"""

from __future__ import annotations

import os

import jax.numpy as jnp

from e4s_tpu.ops import conv as convops
from e4s_tpu.ops.modconv import (  # noqa: F401  (re-exported)
    _composite_up_kernel,
    depth_to_space2,
    space_to_depth2,
)
from e4s_tpu.ops.upfirdn2d import make_kernel


def packed_d_wanted() -> bool:
    """Packed discriminator head (default ON; E4S_TPU_PACKED_D=0 disables).

    Speed is a wash on v5e (interleaved A/B, bf16 batch-2 D forward @1024²:
    25.27 ms off vs 25.25 ms on) — the D's NCHW conv FORWARD layouts keep
    the wide spatial dim on the 128-lane axis either way. But the D-step
    BACKWARD at per-chip batch >= 4 chooses channels-minor temp layouts for
    the 32-channel 1024² blocks (4x lane padding, 38% HBM utilization) and
    runs out of HBM: 18.3G needed vs 15.75G. With the packed head the same
    step fits and B=4 trains at 8.7 img/s/chip (round-5 A/B, DESIGN.md §6),
    so packed is the default."""
    return os.environ.get("E4S_TPU_PACKED_D", "") != "0"


def packed_d_max_ch() -> int:
    """Pack a discriminator block while its input channel count is below
    this (default 128 — the TPU lane width; >=128-channel convs are already
    full-lane). Tests raise it via E4S_TPU_PACKED_D_MAX_CH to exercise the
    path on tiny discriminators."""
    return int(os.environ.get("E4S_TPU_PACKED_D_MAX_CH", "128"))


def _phase_split(s: int) -> tuple[int, int]:
    """Unpacked offset s -> (packed offset, phase). Python % keeps the
    phase in {0,1} for negative s."""
    c = s % 2
    return (s - c) // 2, c


def _packed_kernel_s1(w):
    """[Co,Ci,k,k] (k odd) -> ([4Co,4Ci,kp,kp] OIHW, SAME pad) for the
    packed-domain stride-1 conv. Output phase a, tap u reads unpacked
    offset s = a + u - k//2; the (a,u)->(tap,phase) map is injective per a,
    so this is a pure scatter."""
    Co, Ci, kh, kw = w.shape
    assert kh == kw and kh % 2 == 1
    L = kh // 2
    offs = sorted({_phase_split(a + u - L)[0] for a in (0, 1) for u in range(kh)})
    omin, omax = offs[0], offs[-1]
    assert -omin == omax, "SAME packed padding requires a symmetric tap range"
    kp = omax - omin + 1
    K = jnp.zeros((2, 2, Co, 2, 2, Ci, kp, kp), w.dtype)
    for ay in (0, 1):
        for uy in range(kh):
            ty, cy = _phase_split(ay + uy - L)
            for ax in (0, 1):
                for ux in range(kw):
                    tx, cx = _phase_split(ax + ux - L)
                    K = K.at[ay, ax, :, cy, cx, :, ty - omin, tx - omin].set(
                        w[:, :, uy, ux]
                    )
    return K.reshape(4 * Co, 4 * Ci, kp, kp), -omin


def packed_conv2d_s1(xp, w, bias=None):
    """Stride-1 SAME conv wholly in the packed domain.

    xp: [B,H,W,4Ci]; w: [Co,Ci,k,k] (k odd; k in {1,3} in practice);
    returns [B,H,W,4Co] == space_to_depth2(conv2d(depth_to_space2(xp), w,
    padding=k//2, channels_last=True)). Exact.
    """
    K, pad = _packed_kernel_s1(w)
    out = convops.conv2d(xp, K, padding=pad, channels_last=True)
    if bias is not None:
        out = out + jnp.tile(bias, 4).reshape(1, 1, 1, -1).astype(out.dtype)
    return out


def _packed_kernel_down2(E, L):
    """Composite stride-2 kernel -> packed stride-1 kernel.

    E: [Co,Ci,K,K] with unpacked semantics y(o) = sum_t E[t] x(2o + t - L);
    returns ([Co, 4Ci, kp, kp] OIHW, SAME pad). The output of the packed
    conv is UNPACKED (the stride-2 output grid is the packed row grid)."""
    Co, Ci, Kh, Kw = E.shape
    assert Kh == Kw
    offs = sorted({_phase_split(t - L)[0] for t in range(Kh)})
    omin, omax = offs[0], offs[-1]
    assert -omin == omax, "SAME packed padding requires a symmetric tap range"
    kp = omax - omin + 1
    K = jnp.zeros((Co, 2, 2, Ci, kp, kp), E.dtype)
    for ty0 in range(Kh):
        qy, cy = _phase_split(ty0 - L)
        for tx0 in range(Kw):
            qx, cx = _phase_split(tx0 - L)
            K = K.at[:, cy, cx, :, qy - omin, qx - omin].set(E[:, :, ty0, tx0])
    return K.reshape(Co, 4 * Ci, kp, kp), -omin


def packed_conv2d_down2(xp, w, blur_kernel=(1, 3, 3, 1), bias=None):
    """FIR blur + stride-2 VALID conv fused, consuming packed input.

    Replicates the discriminator's downsample ConvLayer (ref:
    src/models/stylegan2/model.py:670-716): upfirdn2d(pad0,pad1) with the
    normalised blur then EqualConv2d(stride=2, padding=0). xp: [B,H,W,4Ci]
    (packing of [B,2H,2W,Ci]); w: [Co,Ci,k,k], k odd; returns UNPACKED
    NHWC [B,H,W,Co]. Exact: the composite is
      y(o) = sum_{u,j} w[u] kf[j] x(2o + u + j - pad0),   kf = flip(blur2d)
    and on the packed grid that is one stride-1 SAME conv.
    """
    ksize = w.shape[-1]
    blen = len(blur_kernel)
    p = (blen - 2) + (ksize - 1)
    pad0 = (p + 1) // 2
    pad1 = p // 2
    assert pad0 == pad1, "packed downsample requires symmetric blur padding"
    bk = make_kernel(blur_kernel)
    # E[t] = sum_{u+j=t} w[u] kf[j] with kf = flip(bk): _composite_up_kernel
    # computes sum_{u+j=t} w[u] b[j], so pass the flipped blur.
    E = _composite_up_kernel(w, jnp.flip(bk, (0, 1)))  # [Co,Ci,k+blen-1,...]
    K, pad = _packed_kernel_down2(E, pad0)
    out = convops.conv2d(xp, K, padding=pad, channels_last=True)
    if bias is not None:
        out = out + bias.reshape(1, 1, 1, -1).astype(out.dtype)
    return out
