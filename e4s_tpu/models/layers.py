"""Equalised-learning-rate building blocks (StyleGAN2 layer zoo).

Parity targets: src/models/stylegan2/model.py:15-181. Parameter names and
layouts mirror the torch modules 1:1 (weight [out,in] / OIHW) so checkpoint
conversion is a pure name-map.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from e4s_tpu.ops import conv as convops
from e4s_tpu.ops.fused_act import fused_leaky_relu, scaled_leaky_relu
from e4s_tpu.ops.upfirdn2d import blur as blur_op


def pixel_norm(x: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """ref: src/models/stylegan2/model.py:15-20"""
    return x * jax.lax.rsqrt(jnp.mean(x**2, axis=1, keepdims=True) + eps)


class EqualLinear(nn.Module):
    """Linear with equalised lr and optional fused leaky-relu activation.

    ref: src/models/stylegan2/model.py:135-169
    """

    out_dim: int
    use_bias: bool = True
    bias_init: float = 0.0
    lr_mul: float = 1.0
    activation: Optional[str] = None  # None | "fused_lrelu"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_dim = x.shape[-1]
        weight = self.param(
            "weight",
            lambda key: jax.random.normal(key, (self.out_dim, in_dim)) / self.lr_mul,
        )
        scale = (1.0 / math.sqrt(in_dim)) * self.lr_mul
        bias = None
        if self.use_bias:
            bias = self.param(
                # explicit dtype: weak-typed params change aval after the first
                # optimizer update and force jit retraces of the train step
                "bias",
                lambda key: jnp.full((self.out_dim,), self.bias_init, jnp.float32)
            )
        w = (weight * scale).astype(x.dtype)
        out = x @ w.T
        if self.activation == "fused_lrelu":
            out = fused_leaky_relu(out, (bias * self.lr_mul).astype(out.dtype))
        elif bias is not None:
            out = out + (bias * self.lr_mul).astype(out.dtype)
        return out


class EqualConv2d(nn.Module):
    """Conv2d with equalised lr. ref: src/models/stylegan2/model.py:97-132"""

    out_channel: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        packed_in: bool = False,
        fold_blur_down=None,
    ) -> jnp.ndarray:
        """``packed_in``: x is space-to-depth packed NHWC [B,H,W,4Ci] (see
        e4s_tpu.ops.packed). A stride-1 call returns packed [B,H,W,4Co];
        with ``fold_blur_down`` (the blur taps) the layer computes the
        blur + stride-2 composite and returns UNPACKED NHWC [B,H,W,Co].
        Params are identical in all modes."""
        in_channel = x.shape[-1] // 4 if packed_in else x.shape[1]
        weight = self.param(
            "weight",
            nn.initializers.normal(stddev=1.0),
            (self.out_channel, in_channel, self.kernel_size, self.kernel_size),
        )
        scale = 1.0 / math.sqrt(in_channel * self.kernel_size**2)
        bias = (
            self.param("bias", nn.initializers.zeros, (self.out_channel,))
            if self.use_bias
            else None
        )
        if packed_in:
            from e4s_tpu.ops.packed import packed_conv2d_down2, packed_conv2d_s1

            if fold_blur_down is not None:
                assert self.stride == 2 and self.padding == 0
                return packed_conv2d_down2(
                    x, weight * scale, blur_kernel=fold_blur_down, bias=bias
                )
            assert self.stride == 1 and self.padding == self.kernel_size // 2
            return packed_conv2d_s1(x, weight * scale, bias=bias)
        return convops.conv2d(
            x, weight * scale, bias=bias, stride=self.stride, padding=self.padding
        )


class FusedLeakyReLU(nn.Module):
    """Learned per-channel bias + leaky relu + sqrt(2) gain.

    ref: src/models/stylegan2/op/fused_act.py:72-85
    """

    channel: int
    negative_slope: float = 0.2
    scale: float = math.sqrt(2.0)
    channels_last: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, packed: bool = False) -> jnp.ndarray:
        """``packed``: x is space-to-depth packed [B,H,W,4C] (phase-major);
        the per-channel bias is tiled across the 4 phases — exact."""
        bias = self.param("bias", nn.initializers.zeros, (self.channel,))
        if packed:
            bias = jnp.tile(bias, 4)
        return fused_leaky_relu(
            x, bias, self.negative_slope, self.scale,
            channels_last=self.channels_last or packed,
        )


class ConvLayer(nn.Module):
    """Blur-downsample + EqualConv + activation stack (discriminator ladder).

    ref: src/models/stylegan2/model.py:670-716
    """

    out_channel: int
    kernel_size: int
    downsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    use_bias: bool = True
    activate: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, packed_in: bool = False) -> jnp.ndarray:
        """``packed_in``: x is space-to-depth packed NHWC (see
        e4s_tpu.ops.packed). Non-downsample layers stay in the packed
        domain; downsample layers fold the blur into the stride-2 conv and
        return UNPACKED NHWC. Params identical in all modes."""
        if self.downsample:
            p = (len(self.blur_kernel) - 2) + (self.kernel_size - 1)
            pad0 = (p + 1) // 2
            pad1 = p // 2
            if not packed_in:
                x = blur_op(x, self.blur_kernel, pad=(pad0, pad1))
            stride, padding = 2, 0
        else:
            stride, padding = 1, self.kernel_size // 2
        x = EqualConv2d(
            self.out_channel,
            self.kernel_size,
            stride=stride,
            padding=padding,
            use_bias=self.use_bias and not self.activate,
            name="conv",
        )(
            x,
            packed_in=packed_in,
            fold_blur_down=(
                tuple(self.blur_kernel) if packed_in and self.downsample else None
            ),
        )
        # after a packed downsample the tensor is unpacked NHWC
        out_packed = packed_in and not self.downsample
        out_nhwc = packed_in and self.downsample
        if self.activate:
            if self.use_bias:
                x = FusedLeakyReLU(
                    self.out_channel, channels_last=out_nhwc, name="activate"
                )(x, packed=out_packed)
            else:
                x = scaled_leaky_relu(x)
        return x
