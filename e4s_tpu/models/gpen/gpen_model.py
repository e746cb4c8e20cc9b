"""GPEN generator: CNN encoder + noise-concat StyleGAN2 decoder.

Parity target: src/pretrained/gpen/face_model/gpen_model.py (FullGenerator,
:628-692; Generator :380-555 with isconcat=True — NoiseInjection CONCATENATES
the scaled noise, doubling channels, and the "noise" inputs are the encoder's
per-scale features, giving U-Net-like skips).

Reuses the framework's modulated-conv / upfirdn2d / equalised-layer ops — the
reference's byte-duplicated op directory (#3 in SURVEY §2) collapses into the
shared kernels.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from e4s_tpu.models.layers import ConvLayer, EqualLinear, FusedLeakyReLU, pixel_norm
from e4s_tpu.ops.modconv import modulated_conv2d
from e4s_tpu.ops.upfirdn2d import upsample2


def gpen_channels(channel_multiplier: int = 2, narrow: float = 1.0):
    """ref: gpen_model.py:411-422"""
    return {
        4: int(512 * narrow), 8: int(512 * narrow), 16: int(512 * narrow),
        32: int(512 * narrow),
        64: int(256 * channel_multiplier * narrow),
        128: int(128 * channel_multiplier * narrow),
        256: int(64 * channel_multiplier * narrow),
        512: int(32 * channel_multiplier * narrow),
        1024: int(16 * channel_multiplier * narrow),
        2048: int(8 * channel_multiplier * narrow),
    }


class GPENModulatedConv2d(nn.Module):
    """Plain (non-masked) modulated conv. ref: gpen_model.py:180-285"""

    in_channel: int
    out_channel: int
    kernel_size: int
    demodulate: bool = True
    upsample: bool = False

    @nn.compact
    def __call__(self, x, style):
        weight = self.param(
            "weight", nn.initializers.normal(1.0),
            (self.out_channel, self.in_channel, self.kernel_size, self.kernel_size),
        )
        scale = 1.0 / math.sqrt(self.in_channel * self.kernel_size**2)
        s = EqualLinear(self.in_channel, bias_init=1.0, name="modulation")(style)
        return modulated_conv2d(
            x, weight * scale, s, demodulate=self.demodulate, up=self.upsample
        )


class GPENStyledConv(nn.Module):
    """StyledConv with noise CONCAT (isconcat). ref: gpen_model.py:318-356"""

    in_channel: int
    out_channel: int
    kernel_size: int
    upsample: bool = False
    isconcat: bool = True

    @nn.compact
    def __call__(self, x, style, noise):
        out = GPENModulatedConv2d(
            self.in_channel, self.out_channel, self.kernel_size,
            upsample=self.upsample, name="conv",
        )(x, style)
        w = self.param("noise_weight", nn.initializers.zeros, (1,))
        if noise is None:
            # ref NoiseInjection samples fresh normal noise when none is
            # provided (gpen_model.py:294-297); fall back to zeros when no
            # rng stream is supplied (deterministic use)
            if self.has_rng("noise"):
                noise = jax.random.normal(
                    self.make_rng("noise"), out.shape, out.dtype
                )
            else:
                noise = jnp.zeros_like(out)
        if self.isconcat:
            out = jnp.concatenate([out, w.astype(out.dtype) * noise], axis=1)
        else:
            out = out + w.astype(out.dtype) * noise
        mult = 2 if self.isconcat else 1
        return FusedLeakyReLU(self.out_channel * mult, name="activate")(out)


class GPENToRGB(nn.Module):
    """ref: gpen_model.py:359-378"""

    in_channel: int

    @nn.compact
    def __call__(self, x, style, skip=None):
        out = GPENModulatedConv2d(self.in_channel, 3, 1, demodulate=False, name="conv")(x, style)
        bias = self.param("bias", nn.initializers.zeros, (1, 3, 1, 1))
        out = out + bias.astype(out.dtype)
        if skip is not None:
            out = out + upsample2(skip)
        return out


class GPENGenerator(nn.Module):
    """ref: gpen_model.py:380-555"""

    size: int = 512
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2
    narrow: float = 1.0
    isconcat: bool = True
    lr_mlp: float = 0.01

    @nn.compact
    def __call__(self, styles, noise=None, input_is_latent: bool = False,
                 return_latents: bool = False):
        channels = gpen_channels(self.channel_multiplier, self.narrow)
        log_size = int(math.log2(self.size))
        n_latent = log_size * 2 - 2
        fm = 2 if self.isconcat else 1

        if not input_is_latent:
            mapped = []
            for s in styles:
                out = pixel_norm(s)
                for i in range(self.n_mlp):
                    out = EqualLinear(
                        self.style_dim, lr_mul=self.lr_mlp,
                        activation="fused_lrelu", name=f"style_{i + 1}",
                    )(out)
                mapped.append(out)
            styles = mapped

        latent = jnp.repeat(styles[0][:, None], n_latent, axis=1)

        const = self.param(
            "input", nn.initializers.normal(1.0), (1, channels[4], 4, 4)
        )
        B = latent.shape[0]
        out = jnp.broadcast_to(const.astype(latent.dtype), (B,) + const.shape[1:])
        if noise is None:
            noise = [None] * (2 * (log_size - 2) + 1)
        out = GPENStyledConv(
            channels[4], channels[4], 3, isconcat=self.isconcat, name="conv1"
        )(out, latent[:, 0], noise[0])
        skip = GPENToRGB(channels[4] * fm, name="to_rgb1")(out, latent[:, 1])

        in_channel = channels[4]
        i = 1
        for s in range(3, log_size + 1):
            out_channel = channels[2**s]
            out = GPENStyledConv(
                in_channel * fm, out_channel, 3, upsample=True,
                isconcat=self.isconcat, name=f"convs_{2 * (s - 3)}",
            )(out, latent[:, i], noise[2 * (s - 3) + 1])
            out = GPENStyledConv(
                out_channel * fm, out_channel, 3, isconcat=self.isconcat,
                name=f"convs_{2 * (s - 3) + 1}",
            )(out, latent[:, i + 1], noise[2 * (s - 3) + 2])
            skip = GPENToRGB(out_channel * fm, name=f"to_rgbs_{s - 3}")(
                out, latent[:, i + 2], skip
            )
            in_channel = out_channel
            i += 2

        if return_latents:
            return skip, latent
        return skip, None


class GPENFullGeneratorSR(nn.Module):
    """Encoder at in_size + generator decoding to out_size > in_size; the
    extra top scales get no encoder skips (zero noise).

    ref: gpen_model.py:752-818 (FullGenerator_SR)
    """

    in_size: int = 512
    out_size: int = 1024
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2
    narrow: float = 1.0
    isconcat: bool = True

    @nn.compact
    def __call__(self, x):
        channels = gpen_channels(self.channel_multiplier, self.narrow)
        log_in = int(math.log2(self.in_size))
        log_out = int(math.log2(self.out_size))

        noise = [None] * (log_out - log_in)
        out = ConvLayer(channels[self.in_size], 1, name="ecd0")(x)
        noise.append(out)
        for idx, s in enumerate(range(log_in, 2, -1)):
            out_channel = channels[2 ** (s - 1)]
            out = ConvLayer(
                out_channel, 3, downsample=True, name=f"ecd{idx + 1}"
            )(out)
            noise.append(out)

        flat = out.reshape(out.shape[0], -1)
        style = EqualLinear(
            self.style_dim, activation="fused_lrelu", name="final_linear"
        )(flat)

        doubled = []
        for n in noise:
            doubled += [n, n]
        noise_sched = doubled[::-1][1:]

        return GPENGenerator(
            size=self.out_size, style_dim=self.style_dim, n_mlp=self.n_mlp,
            channel_multiplier=self.channel_multiplier, narrow=self.narrow,
            isconcat=self.isconcat, name="generator",
        )([style], noise=noise_sched)


class GPENFullGenerator(nn.Module):
    """Encoder (providing per-scale noise skips) + GPENGenerator.

    ref: gpen_model.py:628-692
    """

    size: int = 512
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2
    narrow: float = 1.0
    isconcat: bool = True

    @nn.compact
    def __call__(self, x):
        channels = gpen_channels(self.channel_multiplier, self.narrow)
        log_size = int(math.log2(self.size))

        noise = []
        out = ConvLayer(channels[self.size], 1, name="ecd0")(x)
        noise.append(out)
        in_channel = channels[self.size]
        for idx, s in enumerate(range(log_size, 2, -1)):
            out_channel = channels[2 ** (s - 1)]
            out = ConvLayer(
                out_channel, 3, downsample=True, name=f"ecd{idx + 1}"
            )(out)
            noise.append(out)
            in_channel = out_channel

        flat = out.reshape(out.shape[0], -1)
        style = EqualLinear(
            self.style_dim, activation="fused_lrelu", name="final_linear"
        )(flat)

        # each encoder feature used twice, reversed, first dropped
        # (ref: gpen_model.py:688-689)
        doubled = []
        for n in noise:
            doubled += [n, n]
        noise_sched = doubled[::-1][1:]

        return GPENGenerator(
            size=self.size, style_dim=self.style_dim, n_mlp=self.n_mlp,
            channel_multiplier=self.channel_multiplier, narrow=self.narrow,
            isconcat=self.isconcat, name="generator",
        )([style], noise=noise_sched)
