"""upfirdn2d — fused upsample → FIR filter → downsample, TPU-native.

This is the resampling primitive under every StyleGAN2 Blur / Upsample /
Downsample block (ref: src/models/stylegan2/op/upfirdn2d.py:142-147 defines the
public signature; the CUDA kernel ref: upfirdn2d_kernel.cu implements it).

TPU design
----------
Instead of a hand-written CUDA kernel + manual autograd.Function pair, we
express the op as a single ``lax.conv_general_dilated`` call:

- upsampling by ``up``      -> ``lhs_dilation`` (zero stuffing, done by XLA)
- FIR filtering             -> depthwise correlation with the flipped kernel
- padding (possibly < 0)    -> XLA conv padding (negative padding crops)
- downsampling by ``down``  -> ``window_strides``

XLA differentiates this natively (the VJP is itself a dilated conv with the
flipped kernel and swapped up/down — exactly the g_pad trick the reference
implements by hand, ref: upfirdn2d.py:104-113), so no custom VJP is needed for
correctness. Double-backward (needed by R1/path-length regularisers) is also
native.

A dedicated Pallas kernel was evaluated and retired: a single depthwise
dilated conv is already a memory-bound op that XLA schedules well, and the
masked-modconv kernel (``e4s_tpu.ops.pallas.modconv_tpu``) absorbs the only
upfirdn2d instances that sit on the hot path (the polyphase-folded upsample
blurs in the masked generator layers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def make_kernel(k) -> jnp.ndarray:
    """Build a normalised 2-D FIR kernel from a 1-D or 2-D tap list.

    ref: src/models/stylegan2/model.py:23-31
    """
    k = jnp.asarray(k, dtype=jnp.float32)
    if k.ndim == 1:
        k = k[None, :] * k[:, None]
    k = k / jnp.sum(k)
    return k


def upfirdn2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    up: int = 1,
    down: int = 1,
    pad: tuple[int, int] = (0, 0),
    channels_last: bool = False,
) -> jnp.ndarray:
    """Apply upsample(up) -> FIR(kernel) -> downsample(down) with padding.

    Args:
      x:      [B, C, H, W] input ([B, H, W, C] when ``channels_last``).
      kernel: [kh, kw] FIR kernel (not flipped; we correlate with the flipped
              kernel, matching the reference convention).
      up:     integer upsampling factor (zero-stuffing).
      down:   integer downsampling factor.
      pad:    (pad0, pad1) applied to both spatial dims, may be negative.

    Returns:
      [B, C, H_out, W_out] with
      H_out = (H*up + pad0 + pad1 - kh) // down + 1.

    ref: src/models/stylegan2/op/upfirdn2d.py:142-147 (public signature),
         :150-184 (upfirdn2d_native semantics this matches exactly).
    """
    return _upfirdn2d_general(
        x, kernel, up_x=up, up_y=up, down_x=down, down_y=down,
        pad_x0=pad[0], pad_x1=pad[1], pad_y0=pad[0], pad_y1=pad[1],
        channels_last=channels_last,
    )


def _upfirdn2d_general(
    x, kernel, *, up_x, up_y, down_x, down_y, pad_x0, pad_x1, pad_y0, pad_y1,
    channels_last=False,
):
    if channels_last:
        B, H, W, C = x.shape
    else:
        B, C, H, W = x.shape
    kh, kw = kernel.shape

    # Depthwise correlation with the flipped kernel == FIR convolution.
    # Kernel layout HWIO with feature_group_count=C: [kh, kw, 1, C].
    flt = jnp.flip(kernel, (0, 1)).astype(x.dtype)
    flt = jnp.broadcast_to(flt[:, :, None, None], (kh, kw, 1, C))

    # up-dilation happens before padding; XLA's spec pads the dilated input,
    # which matches the reference order (zero-stuff, then pad, then filter).
    # Note XLA's `padding` with lhs_dilation pads *around* the dilated array,
    # but lhs_dilation inserts (up-1) zeros strictly *between* elements — the
    # reference zero-stuffs by appending zeros after each element, i.e. its
    # dilated length is H*up (trailing zeros), ours is H*up-(up-1). The extra
    # trailing zeros only ever contribute zeros to the FIR sum, so results
    # agree as long as the requested output extent matches; we compensate by
    # adding (up-1) to the trailing pad.
    dn = (
        ("NHWC", "HWIO", "NHWC") if channels_last else ("NCHW", "HWIO", "NCHW")
    )
    out = lax.conv_general_dilated(
        x,
        flt,
        window_strides=(down_y, down_x),
        padding=((pad_y0, pad_y1 + (up_y - 1)), (pad_x0, pad_x1 + (up_x - 1))),
        lhs_dilation=(up_y, up_x),
        rhs_dilation=(1, 1),
        dimension_numbers=dn,
        feature_group_count=C,
    )

    out_h = (H * up_y + pad_y0 + pad_y1 - kh) // down_y + 1
    out_w = (W * up_x + pad_x0 + pad_x1 - kw) // down_x + 1
    # The trailing-zero compensation can only ever make the output >= the
    # reference extent; crop to the exact reference shape.
    if channels_last:
        return out[:, :out_h, :out_w, :]
    return out[:, :, :out_h, :out_w]


# ---------------------------------------------------------------------------
# StyleGAN2 convenience wrappers (ref: src/models/stylegan2/model.py:34-94)
# ---------------------------------------------------------------------------


def blur(x, kernel, pad, upsample_factor: int = 1, channels_last: bool = False):
    """Blur block: FIR filter with optional gain for post-upsample use.

    ref: src/models/stylegan2/model.py:78-94
    """
    k = make_kernel(kernel)
    if upsample_factor > 1:
        k = k * (upsample_factor ** 2)
    return upfirdn2d(x, k, pad=pad, channels_last=channels_last)


def upsample2(x, kernel=(1, 3, 3, 1), factor: int = 2, channels_last: bool = False):
    """2x upsample with FIR interpolation. ref: model.py:34-53"""
    k = make_kernel(kernel) * (factor ** 2)
    p = k.shape[0] - factor
    pad0 = (p + 1) // 2 + factor - 1
    pad1 = p // 2
    return upfirdn2d(x, k, up=factor, down=1, pad=(pad0, pad1),
                     channels_last=channels_last)


def upsample2_packed(x, kernel=(1, 3, 3, 1)):
    """2x FIR upsample emitting the PACKED (space-to-depth) result.

    x: [B,H,W,C] NHWC; returns [B,H,W,4C] == space_to_depth2(upsample2(x)),
    phase-major (a,b), C minor. Used by the packed generator tail (see
    e4s_tpu.ops.modconv packed-domain section) for the ToRGB skip upsample.

    Derivation: upsample2 computes y(q) = sum_j k[j]·xz(q+1-j) with the
    4-tap kernel (up=2, pad=(2,1), correlation with the flipped kernel).
    Per output phase a (q=2i+a) only taps of one parity survive:
      y(2i)   = k[1]·x(i) + k[3]·x(i-1)
      y(2i+1) = k[2]·x(i) + k[0]·x(i+1)
    i.e. per phase a a SAME-padded 3-tap conv with kernel
      a=0: [k3, k1, 0]    a=1: [0, k2, k0].
    """
    assert len(kernel) == 4, "packed upsample specialised to 4-tap blurs"
    # make_kernel semantics in host numpy (kernel is static; building the
    # taps with jnp would trace them and break the np scatter below)
    k1 = np.asarray(kernel, np.float32)
    k2d = np.outer(k1, k1)
    k2d = k2d / k2d.sum() * 4.0  # [4,4], x4 upsample gain
    C = x.shape[-1]
    # per-axis tap map: phase a -> {conv tap m: FIR tap j}
    taps = ({0: 3, 1: 1}, {1: 2, 2: 0})
    K = np.zeros((4, C, C, 3, 3), np.float32)
    for a in (0, 1):
        for b in (0, 1):
            for m1, j1 in taps[a].items():
                for m2, j2 in taps[b].items():
                    for c in range(C):
                        K[a * 2 + b, c, c, m1, m2] = k2d[j1, j2]
    Kt = jnp.asarray(K.reshape(4 * C, C, 3, 3))
    out = lax.conv_general_dilated(
        x, Kt.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
    )
    return out


def downsample2(x, kernel=(1, 3, 3, 1), factor: int = 2, channels_last: bool = False):
    """2x downsample with FIR anti-aliasing. ref: model.py:56-75"""
    k = make_kernel(kernel)
    p = k.shape[0] - factor
    pad0 = (p + 1) // 2
    pad1 = p // 2
    return upfirdn2d(x, k, up=1, down=factor, pad=(pad0, pad1),
                     channels_last=channels_last)
