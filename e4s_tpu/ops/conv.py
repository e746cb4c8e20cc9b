"""Torch-layout convolution helpers on top of lax.conv_general_dilated.

Weights use torch OIHW layout ([out, in, kh, kw]) throughout the framework so
checkpoint conversion is a pure tree-map; XLA re-lays them out for the MXU at
compile time, so this costs nothing at runtime.

The reference's conv2d_gradfix (ref: src/models/stylegan2/op/conv2d_gradfix.py)
exists only because PyTorch's cudnn conv lacked double-backward; JAX convs are
natively twice-differentiable, so R1 / path-length regularisers need no
special casing here.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_DN = ("NCHW", "OIHW", "NCHW")
_DN_NHWC = ("NHWC", "OIHW", "NHWC")


def conv2d(
    x, w, bias=None, stride: int = 1, padding: int = 0, groups: int = 1,
    channels_last: bool = False,
):
    """``F.conv2d`` parity. x: [B,Cin,H,W] (or [B,H,W,Cin] when
    ``channels_last``), w: [Cout,Cin/groups,kh,kw] (torch OIHW either way)."""
    out = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=_DN_NHWC if channels_last else _DN,
        feature_group_count=groups,
    )
    if bias is not None:
        bshape = (1, 1, 1, -1) if channels_last else (1, -1, 1, 1)
        out = out + bias.reshape(bshape).astype(out.dtype)
    return out


def conv_transpose2d(
    x, w, bias=None, stride: int = 2, padding: int = 0, groups: int = 1,
    channels_last: bool = False,
):
    """``F.conv_transpose2d`` parity. w: [Cin, Cout/groups, kh, kw].

    Implemented as the adjoint conv: zero-stuff the input by ``stride``
    (lhs_dilation), pad by ``k - 1 - padding`` and correlate with the
    spatially-flipped, in/out-transposed weight.
    """
    cin, cout_g, kh, kw = w.shape
    # [Cin, Cout/g, kh, kw] -> groups of [Cin/g, Cout/g, ...] -> OIHW
    wt = jnp.flip(w, (-2, -1))
    if groups > 1:
        wt = wt.reshape(groups, cin // groups, cout_g, kh, kw)
        wt = jnp.swapaxes(wt, 1, 2).reshape(groups * cout_g, cin // groups, kh, kw)
    else:
        wt = jnp.swapaxes(wt, 0, 1)
    out = lax.conv_general_dilated(
        x,
        wt.astype(x.dtype),
        window_strides=(1, 1),
        padding=(
            (kh - 1 - padding, kh - 1 - padding),
            (kw - 1 - padding, kw - 1 - padding),
        ),
        lhs_dilation=(stride, stride),
        dimension_numbers=_DN_NHWC if channels_last else _DN,
        feature_group_count=groups,
    )
    if bias is not None:
        bshape = (1, 1, 1, -1) if channels_last else (1, -1, 1, 1)
        out = out + bias.reshape(bshape).astype(out.dtype)
    return out
