"""RGI texture encoder (FSEncoder_PSP) + IR-SE backbones.

Parity targets:
- src/models/encoders/helpers.py (SEModule, bottleneck_IR / _SE / _SE_Ours)
- src/models/encoders/psp_encoders.py:238-308 (FSEncoder_PSP)
- src/models/encoders/model_irse.py:9-69 (IR-SE50 Backbone for the ID loss)

The per-(sample, region) masked_select loop of the reference
(psp_encoders.py:264-283) becomes one einsum (ops.masked_pool) — fully
jittable, no data-dependent shapes.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from e4s_tpu.ops.masked_pool import masked_region_mean
from e4s_tpu.ops.resize import adaptive_avg_pool2d


class PReLU(nn.Module):
    """Per-channel PReLU over the channel axis (axis 1, or -1 for NHWC)."""

    channel: int
    channels_last: bool = False

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "weight", lambda key: jnp.full((self.channel,), 0.25, jnp.float32)
        ).astype(x.dtype)
        if self.channels_last:
            w = w.reshape((1,) * (x.ndim - 1) + (-1,))
        else:
            w = w.reshape((1, -1) + (1,) * (x.ndim - 2))
        return jnp.maximum(x, 0) + w * jnp.minimum(x, 0)


class InstanceNorm(nn.Module):
    """torch InstanceNorm2d defaults: affine=False, eps=1e-5 (no params)."""

    eps: float = 1e-5
    channels_last: bool = False

    def __call__(self, x):
        axes = (-3, -2) if self.channels_last else (-2, -1)
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.eps)


class FrozenBatchNorm(nn.Module):
    """BatchNorm2d in eval mode (running stats), matching torch param names.

    Stats live in the ``batch_stats`` collection (running_mean/running_var);
    affine weight/bias in ``params``. All aux nets using BN are frozen and run
    in eval mode in E4S (see SURVEY §2.10), so train-mode BN is not needed.
    """

    channel: int
    eps: float = 1e-5
    affine: bool = True
    channels_last: bool = False

    @nn.compact
    def __call__(self, x):
        mean = self.variable(
            "batch_stats", "running_mean", jnp.zeros, (self.channel,)
        ).value
        var = self.variable(
            "batch_stats", "running_var", jnp.ones, (self.channel,)
        ).value
        if self.channels_last:
            shape = (1,) * (x.ndim - 1) + (-1,)
        else:
            shape = (1, -1) + (1,) * (x.ndim - 2)
        y = (x - mean.reshape(shape)) * jax.lax.rsqrt(
            var.reshape(shape) + self.eps
        )
        if self.affine:
            w = self.param("weight", nn.initializers.ones, (self.channel,))
            b = self.param("bias", nn.initializers.zeros, (self.channel,))
            y = y * w.reshape(shape) + b.reshape(shape)
        return y


class Conv(nn.Module):
    """Plain torch-layout conv (OIHW weight, named 'weight'/'bias')."""

    out_channel: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    channels_last: bool = False

    @nn.compact
    def __call__(self, x):
        from e4s_tpu.ops import conv as convops

        in_channel = x.shape[-1] if self.channels_last else x.shape[1]
        fan_in = in_channel * self.kernel_size**2
        bound = 1.0 / math.sqrt(fan_in)
        weight = self.param(
            "weight",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (self.out_channel, in_channel, self.kernel_size, self.kernel_size),
        )
        bias = (
            self.param(
                "bias", nn.initializers.uniform(scale=2 * bound), (self.out_channel,)
            )
            if self.use_bias
            else None
        )
        return convops.conv2d(
            x, weight, bias=bias, stride=self.stride, padding=self.padding,
            channels_last=self.channels_last,
        )


class SEModule(nn.Module):
    """Squeeze-excitation. ref: src/models/encoders/helpers.py:56-72"""

    channels: int
    reduction: int = 16
    channels_last: bool = False

    @nn.compact
    def __call__(self, x):
        cl = self.channels_last
        axes = (-3, -2) if cl else (-2, -1)
        s = jnp.mean(x, axis=axes, keepdims=True)
        s = Conv(
            self.channels // self.reduction, 1, use_bias=False,
            channels_last=cl, name="fc1",
        )(s)
        s = jax.nn.relu(s)
        s = Conv(self.channels, 1, use_bias=False, channels_last=cl, name="fc2")(s)
        return x * jax.nn.sigmoid(s)


class BottleneckIRSE(nn.Module):
    """IR-SE residual unit; ``norm`` selects BatchNorm (ID-loss backbone,
    ref: helpers.py:97-119) or InstanceNorm ("Ours" RGI encoder variant,
    ref: helpers.py:122-144).
    """

    in_channel: int
    depth: int
    stride: int
    norm: str = "bn"  # "bn" | "in"
    use_se: bool = True
    channels_last: bool = False

    @nn.compact
    def __call__(self, x):
        cl = self.channels_last

        def mk_norm(channel, name):
            if self.norm == "in":
                return InstanceNorm(channels_last=cl)
            return FrozenBatchNorm(channel, channels_last=cl, name=name)

        if self.in_channel == self.depth:
            # MaxPool2d(1, s)
            if cl:
                shortcut = x[:, :: self.stride, :: self.stride, :]
            else:
                shortcut = x[:, :, :: self.stride, :: self.stride]
        else:
            shortcut = Conv(
                self.depth, 1, stride=self.stride, use_bias=False,
                channels_last=cl, name="shortcut_conv",
            )(x)
            shortcut = mk_norm(self.depth, "shortcut_norm")(shortcut)

        res = mk_norm(self.in_channel, "res_norm1")(x)
        res = Conv(
            self.depth, 3, padding=1, use_bias=False, channels_last=cl,
            name="res_conv1",
        )(res)
        res = PReLU(self.depth, channels_last=cl, name="res_prelu")(res)
        res = Conv(
            self.depth, 3, stride=self.stride, padding=1, use_bias=False,
            channels_last=cl, name="res_conv2",
        )(res)
        res = mk_norm(self.depth, "res_norm2")(res)
        if self.use_se:
            res = SEModule(self.depth, 16, channels_last=cl, name="res_se")(res)
        return res + shortcut


def irse50_blocks():
    """(in, depth, stride) per unit for the 50-layer net.
    ref: src/models/encoders/helpers.py:29-36"""
    blocks = []
    for in_c, depth, n in ((64, 64, 3), (64, 128, 4), (128, 256, 14), (256, 512, 3)):
        blocks.append((in_c, depth, 2))
        blocks += [(depth, depth, 1)] * (n - 1)
    return blocks


def fsencoder_blocks(slim: bool = False):
    """RGI encoder trunk config. ref: src/models/encoders/psp_encoders.py:242-247

    ``slim``: one block per stage instead of (3,4,14,3) — same stage widths,
    strides and tap dimensionality (so the downstream MLPs are identical) with
    ~6x fewer layers. Used only for compile-budgeted validation runs (the
    driver's virtual-CPU multichip dryrun); never for training or parity.
    """
    stages = ((64, 128, 3), (128, 256, 4), (256, 512, 14), (512, 512, 3))
    blocks = []
    for in_c, depth, n in stages:
        blocks.append((in_c, depth, 2))
        blocks += [(depth, depth, 1)] * (0 if slim else n - 1)
    return blocks


class FSEncoderPSP(nn.Module):
    """RGI texture extractor: IN-normalised IR-SE trunk + masked pooling.

    forward(x[B,3,256,256], segmap[B,R,Hm,Wm]) ->
      codes [B, R, 1280], structure_feats [B,512,16,16] (zeros, as reference).

    ref: src/models/encoders/psp_encoders.py:238-308
    """

    num_seg_cls: int = 12
    # NHWC trunk: input x is [B,256,256,3]; segmap stays [B,R,H,W] and the
    # returned structure_feats stay NCHW-shaped (zeros; layout-free API)
    channels_last: bool = False
    # one block per stage (see fsencoder_blocks) — validation-scale only
    slim: bool = False

    @nn.compact
    def __call__(self, x, segmap):
        cl = self.channels_last
        x = Conv(
            64, 3, padding=1, use_bias=False, channels_last=cl,
            name="input_conv",
        )(x)
        x = InstanceNorm(channels_last=cl)(x)
        x = PReLU(64, channels_last=cl, name="input_prelu")(x)

        # taps at the last 256-ch block and the two final 512-ch blocks
        # (ref: psp_encoders.py:290-296 — body indices 6, 20, 23)
        tap_ids = (1, 2, 3) if self.slim else (6, 20, 23)
        taps = {}
        for i, (in_c, depth, stride) in enumerate(fsencoder_blocks(self.slim)):
            x = BottleneckIRSE(
                in_c, depth, stride, norm="in", channels_last=cl,
                name=f"body_{i}",
            )(x)
            if i in tap_ids:
                taps[i] = x

        if cl:
            structure_feats = jnp.zeros(
                (x.shape[0], x.shape[3], x.shape[1], x.shape[2]), x.dtype
            )
        else:
            structure_feats = jnp.zeros_like(x)
        codes = jnp.concatenate(
            [
                masked_region_mean(taps[t], segmap, channels_last=cl)
                for t in tap_ids
            ],
            axis=-1,
        )
        return codes, structure_feats


class IRSE50Backbone(nn.Module):
    """ArcFace IR-SE50 recognition backbone (frozen; ID loss).

    ref: src/models/encoders/model_irse.py:9-69 (input_size=112).
    Returns l2-normalised multi-scale features [c1,c2,c3,c4,emb] when
    ``multi_scale`` else [emb].
    """

    drop_ratio: float = 0.6  # inactive in eval mode

    @nn.compact
    def __call__(self, x, multi_scale: bool = True):
        def l2n(v):
            return v / jnp.linalg.norm(v, axis=1, keepdims=True)

        x = Conv(64, 3, padding=1, use_bias=False, name="input_conv")(x)
        x = FrozenBatchNorm(64, name="input_bn")(x)
        x = PReLU(64, name="input_prelu")(x)

        feats = []
        for i, (in_c, depth, stride) in enumerate(irse50_blocks()):
            x = BottleneckIRSE(in_c, depth, stride, norm="bn", name=f"body_{i}")(x)
            if multi_scale and i in (2, 6, 20, 23):
                feats.append(x.reshape(x.shape[0], -1))

        x = FrozenBatchNorm(512, name="output_bn")(x)
        # Dropout inactive (eval); Flatten + Linear + BatchNorm1d(affine=False)
        x = x.reshape(x.shape[0], -1)
        w = self.param(
            "output_linear_weight",
            nn.initializers.normal(0.01),
            (512, 512 * 7 * 7),
        )
        b = self.param("output_linear_bias", nn.initializers.zeros, (512,))
        x = x @ w.T + b
        x = FrozenBatchNorm(512, affine=False, name="output_bn1d")(
            x[:, :, None, None]
        )[:, :, 0, 0]

        if multi_scale:
            return [l2n(f) for f in feats] + [l2n(x)]
        return [l2n(x)]
