"""FaceVid2Vid building blocks (2D/3D conv blocks, hourglasses, SPADE).

Parity target: src/pretrained/face_vid2vid/modules/util.py. All norms run in
eval mode (the net is frozen in E4S), so SynchronizedBatchNorm == plain BN
with running stats (SURVEY §2.10) and spectral norm is folded into the weight
at conversion time.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from e4s_tpu.models.encoders import Conv, FrozenBatchNorm, InstanceNorm
from e4s_tpu.ops.resize import nearest_resize


class Conv3D(nn.Module):
    """torch nn.Conv3d parity (NCDHW / OIDHW, named weight/bias)."""

    out_channel: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_channel = x.shape[1]
        k = self.kernel_size
        weight = self.param(
            "weight",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (self.out_channel, in_channel, k, k, k),
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.out_channel,))
            if self.use_bias
            else None
        )
        out = lax.conv_general_dilated(
            x,
            weight.astype(x.dtype),
            window_strides=(self.stride,) * 3,
            padding=((self.padding,) * 2,) * 3,
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        )
        if bias is not None:
            out = out + bias.reshape(1, -1, 1, 1, 1).astype(out.dtype)
        return out


def avg_pool_2d(x, k=2):
    return lax.reduce_window(
        x, 0.0, lax.add, (1, 1, k, k), (1, 1, k, k), "VALID"
    ) / (k * k)


def avg_pool_3d_122(x):
    return lax.reduce_window(
        x, 0.0, lax.add, (1, 1, 1, 2, 2), (1, 1, 1, 2, 2), "VALID"
    ) / 4.0


def upsample_nearest_2d(x):
    """F.interpolate(scale_factor=2) default (nearest)."""
    return jnp.repeat(jnp.repeat(x, 2, axis=-2), 2, axis=-1)


def upsample_nearest_3d_122(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=-2), 2, axis=-1)


def make_coordinate_grid_3d(d, h, w, dtype=jnp.float32):
    """[-1,1]^3 meshgrid, last dim (x, y, z). ref: util.py:53-69"""
    x = 2 * (jnp.arange(w, dtype=dtype) / (w - 1)) - 1
    y = 2 * (jnp.arange(h, dtype=dtype) / (h - 1)) - 1
    z = 2 * (jnp.arange(d, dtype=dtype) / (d - 1)) - 1
    zz, yy, xx = jnp.meshgrid(z, y, x, indexing="ij")
    return jnp.stack([xx, yy, zz], axis=-1)  # [d,h,w,3]


def kp2gaussian(kp_value, spatial_size, kp_variance):
    """kp_value: [B,K,3] -> [B,K,d,h,w] gaussians. ref: util.py:11-32"""
    d, h, w = spatial_size
    grid = make_coordinate_grid_3d(d, h, w, kp_value.dtype)  # [d,h,w,3]
    diff = grid[None, None] - kp_value[:, :, None, None, None, :]
    return jnp.exp(-0.5 * jnp.sum(diff**2, axis=-1) / kp_variance)


class ResBottleneck(nn.Module):
    """ref: util.py:72-101"""

    in_features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        f = self.in_features
        out = Conv(f // 4, 1, name="conv1")(x)
        out = FrozenBatchNorm(f // 4, name="norm1")(out)
        out = jax.nn.relu(out)
        out = Conv(f // 4, 3, stride=self.stride, padding=1, name="conv2")(out)
        out = FrozenBatchNorm(f // 4, name="norm2")(out)
        out = jax.nn.relu(out)
        out = Conv(f, 1, name="conv3")(out)
        out = FrozenBatchNorm(f, name="norm3")(out)
        if self.stride != 1:
            x = Conv(f, 1, stride=self.stride, name="skip")(x)
            x = FrozenBatchNorm(f, name="norm4")(x)
        return jax.nn.relu(out + x)


class ResBlock2d(nn.Module):
    """ref: util.py:104-126"""

    in_features: int
    kernel_size: int = 3
    padding: int = 1

    @nn.compact
    def __call__(self, x):
        out = FrozenBatchNorm(self.in_features, name="norm1")(x)
        out = jax.nn.relu(out)
        out = Conv(self.in_features, self.kernel_size, padding=self.padding, name="conv1")(out)
        out = FrozenBatchNorm(self.in_features, name="norm2")(out)
        out = jax.nn.relu(out)
        out = Conv(self.in_features, self.kernel_size, padding=self.padding, name="conv2")(out)
        return out + x


class ResBlock3d(nn.Module):
    """ref: util.py:129-151"""

    in_features: int

    @nn.compact
    def __call__(self, x):
        out = FrozenBatchNorm(self.in_features, name="norm1")(x)
        out = jax.nn.relu(out)
        out = Conv3D(self.in_features, 3, padding=1, name="conv1")(out)
        out = FrozenBatchNorm(self.in_features, name="norm2")(out)
        out = jax.nn.relu(out)
        out = Conv3D(self.in_features, 3, padding=1, name="conv2")(out)
        return out + x


class UpBlock2d(nn.Module):
    """ref: util.py:154-171 (nearest 2x up -> conv -> BN -> relu)"""

    out_features: int

    @nn.compact
    def __call__(self, x):
        out = upsample_nearest_2d(x)
        out = Conv(self.out_features, 3, padding=1, name="conv")(out)
        out = FrozenBatchNorm(self.out_features, name="norm")(out)
        return jax.nn.relu(out)


class UpBlock3d(nn.Module):
    """ref: util.py:173-191 (nearest (1,2,2) up)"""

    out_features: int

    @nn.compact
    def __call__(self, x):
        out = upsample_nearest_3d_122(x)
        out = Conv3D(self.out_features, 3, padding=1, name="conv")(out)
        out = FrozenBatchNorm(self.out_features, name="norm")(out)
        return jax.nn.relu(out)


class DownBlock2d(nn.Module):
    """ref: util.py:194-211"""

    out_features: int

    @nn.compact
    def __call__(self, x):
        out = Conv(self.out_features, 3, padding=1, name="conv")(x)
        out = FrozenBatchNorm(self.out_features, name="norm")(out)
        out = jax.nn.relu(out)
        return avg_pool_2d(out)


class DownBlock3d(nn.Module):
    """ref: util.py:214-235"""

    out_features: int

    @nn.compact
    def __call__(self, x):
        out = Conv3D(self.out_features, 3, padding=1, name="conv")(x)
        out = FrozenBatchNorm(self.out_features, name="norm")(out)
        out = jax.nn.relu(out)
        return avg_pool_3d_122(out)


class SameBlock2d(nn.Module):
    """ref: util.py:238-257"""

    out_features: int
    kernel_size: int = 3
    padding: int = 1
    lrelu: bool = False

    @nn.compact
    def __call__(self, x):
        out = Conv(self.out_features, self.kernel_size, padding=self.padding, name="conv")(x)
        out = FrozenBatchNorm(self.out_features, name="norm")(out)
        if self.lrelu:
            return jax.nn.leaky_relu(out, 0.01)
        return jax.nn.relu(out)


class Hourglass3D(nn.Module):
    """3-D hourglass with skip concat. ref: util.py:260-330"""

    block_expansion: int
    in_features: int
    num_blocks: int = 3
    max_features: int = 256

    @property
    def out_filters(self):
        return self.block_expansion + self.in_features

    @nn.compact
    def __call__(self, x):
        be, mf = self.block_expansion, self.max_features
        outs = [x]
        for i in range(self.num_blocks):
            out_f = min(mf, be * (2 ** (i + 1)))
            outs.append(
                DownBlock3d(out_f, name=f"encoder_down_{i}")(outs[-1])
            )
        out = outs.pop()
        for idx, i in enumerate(range(self.num_blocks)[::-1]):
            out_f = min(mf, be * (2**i))
            out = UpBlock3d(out_f, name=f"decoder_up_{idx}")(out)
            skip = outs.pop()
            out = jnp.concatenate([out, skip], axis=1)
        out = Conv3D(self.out_filters, 3, padding=1, name="decoder_conv")(out)
        out = FrozenBatchNorm(self.out_filters, name="decoder_norm")(out)
        return jax.nn.relu(out)


class KPHourglass(nn.Module):
    """2-D down path -> reshape to 3-D -> 3-D up path. ref: util.py:333-366"""

    block_expansion: int
    reshape_features: int
    reshape_depth: int
    num_blocks: int = 3
    max_features: int = 256

    @nn.compact
    def __call__(self, x):
        be, mf = self.block_expansion, self.max_features
        out = x
        for i in range(self.num_blocks):
            out_f = min(mf, be * (2 ** (i + 1)))
            out = DownBlock2d(out_f, name=f"down_{i}")(out)
        out = Conv(self.reshape_features, 1, name="conv")(out)
        bs, c, h, w = out.shape
        out = out.reshape(bs, c // self.reshape_depth, self.reshape_depth, h, w)
        for i in range(self.num_blocks):
            out_f = min(mf, be * (2 ** (self.num_blocks - i - 1)))
            out = UpBlock3d(out_f, name=f"up_{i}")(out)
        return out


def anti_alias_interpolation(x, scale: float):
    """Gaussian-prefiltered strided downsample. ref: util.py:370-416"""
    if scale == 1.0:
        return x
    C = x.shape[1]
    sigma = (1 / scale - 1) / 2
    ksize = 2 * round(sigma * 4) + 1
    ka = ksize // 2
    kb = ka - 1 if ksize % 2 == 0 else ka
    grid = np.arange(ksize, dtype=np.float32)
    mean = (ksize - 1) / 2
    k1 = np.exp(-((grid - mean) ** 2) / (2 * sigma**2))
    k2d = np.outer(k1, k1)
    k2d = (k2d / k2d.sum()).astype(np.float32)
    flt = jnp.asarray(k2d, x.dtype)[:, :, None, None]
    flt = jnp.broadcast_to(flt, (ksize, ksize, 1, C))
    xp = jnp.pad(x, ((0, 0), (0, 0), (ka, kb), (ka, kb)))
    out = lax.conv_general_dilated(
        xp, flt, (1, 1), "VALID",
        dimension_numbers=("NCHW", "HWIO", "NCHW"), feature_group_count=C,
    )
    inv = int(1 / scale)
    return out[:, :, ::inv, ::inv]


class SPADE(nn.Module):
    """ref: util.py:419-439"""

    norm_nc: int
    label_nc: int

    @nn.compact
    def __call__(self, x, segmap):
        normalized = InstanceNorm()(x)
        seg = nearest_resize(segmap, x.shape[-2:])
        actv = Conv(128, 3, padding=1, name="mlp_shared_conv")(seg)
        actv = jax.nn.relu(actv)
        gamma = Conv(self.norm_nc, 3, padding=1, name="mlp_gamma")(actv)
        beta = Conv(self.norm_nc, 3, padding=1, name="mlp_beta")(actv)
        return normalized * (1 + gamma) + beta


class SPADEResnetBlock(nn.Module):
    """ref: util.py:442-481 (spectral norm folded at conversion)."""

    fin: int
    fout: int
    label_nc: int

    @nn.compact
    def __call__(self, x, seg):
        fmiddle = min(self.fin, self.fout)
        learned_shortcut = self.fin != self.fout
        if learned_shortcut:
            x_s = SPADE(self.fin, self.label_nc, name="norm_s")(x, seg)
            x_s = Conv(self.fout, 1, use_bias=False, name="conv_s")(x_s)
        else:
            x_s = x
        dx = SPADE(self.fin, self.label_nc, name="norm_0")(x, seg)
        dx = Conv(fmiddle, 3, padding=1, name="conv_0")(
            jax.nn.leaky_relu(dx, 0.2)
        )
        dx = SPADE(fmiddle, self.label_nc, name="norm_1")(dx, seg)
        dx = Conv(self.fout, 3, padding=1, name="conv_1")(
            jax.nn.leaky_relu(dx, 0.2)
        )
        return x_s + dx
