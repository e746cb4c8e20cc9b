"""ParseNet — GPEN's 19-class face parser for paste-back masks.

Parity target: src/pretrained/gpen/face_parse/parse_model.py +
face_parse/blocks.py (in/out 512, min_feat 32, base 64, ch_range [32,256],
norm 'bn', relu 'LeakyReLU').
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from e4s_tpu.models.encoders import Conv, FrozenBatchNorm
from e4s_tpu.ops import conv as convops


class PNConvLayer(nn.Module):
    """ReflectionPad + conv (+ BN + LeakyReLU). ref: blocks.py:100-127"""

    out_channels: int
    kernel_size: int = 3
    scale: str = "none"  # none | down | up
    norm: bool = False
    relu: bool = False

    @nn.compact
    def __call__(self, x):
        if self.scale == "up":
            x = jnp.repeat(jnp.repeat(x, 2, axis=-2), 2, axis=-1)
        pad = int(math.ceil((self.kernel_size - 1.0) / 2))
        x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="reflect")
        stride = 2 if self.scale == "down" else 1
        x = Conv(
            self.out_channels, self.kernel_size, stride=stride, padding=0,
            use_bias=not self.norm, name="conv2d",
        )(x)
        if self.norm:
            x = FrozenBatchNorm(self.out_channels, name="norm")(x)
        if self.relu:
            x = jax.nn.leaky_relu(x, 0.2)
        return x


class PNResidualBlock(nn.Module):
    """ref: blocks.py:130-147"""

    c_in: int
    c_out: int
    scale: str = "none"

    @nn.compact
    def __call__(self, x):
        if self.scale == "none" and self.c_in == self.c_out:
            identity = x
        else:
            identity = PNConvLayer(self.c_out, 3, self.scale, name="shortcut")(x)
        conf = {"down": ("none", "down"), "up": ("up", "none"),
                "none": ("none", "none")}[self.scale]
        res = PNConvLayer(self.c_out, 3, conf[0], norm=True, relu=True, name="conv1")(x)
        res = PNConvLayer(self.c_out, 3, conf[1], norm=True, relu=False, name="conv2")(res)
        return identity + res


class ParseNet(nn.Module):
    """ref: parse_model.py:21-77"""

    in_size: int = 512
    out_size: int = 512
    min_feat_size: int = 32
    base_ch: int = 64
    parsing_ch: int = 19
    res_depth: int = 10
    min_ch: int = 32
    max_ch: int = 256

    @nn.compact
    def __call__(self, x):
        clip = lambda c: max(self.min_ch, min(c, self.max_ch))
        mfs = min(self.in_size, self.min_feat_size)
        down_steps = int(np.log2(self.in_size // mfs))
        up_steps = int(np.log2(self.out_size // mfs))

        feat = PNConvLayer(self.base_ch, 3, name="encoder_0")(x)
        head = self.base_ch
        for i in range(down_steps):
            feat = PNResidualBlock(
                clip(head), clip(head * 2), "down", name=f"encoder_{i + 1}"
            )(feat)
            head *= 2

        body = feat
        for i in range(self.res_depth):
            body = PNResidualBlock(clip(head), clip(head), name=f"body_{i}")(body)
        out = feat + body

        for i in range(up_steps):
            out = PNResidualBlock(
                clip(head), clip(head // 2), "up", name=f"decoder_{i}"
            )(out)
            head //= 2

        out_img = PNConvLayer(3, 3, name="out_img_conv")(out)
        out_mask = PNConvLayer(self.parsing_ch, 3, name="out_mask_conv")(out)
        return out_mask, out_img


# binary paste-back colormap (ref: face_parse/face_parsing.py:35)
MASK_COLORMAP = [0, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
                 255, 255, 0, 255, 255, 255, 0]


def parse_mask(logits: jnp.ndarray) -> jnp.ndarray:
    """argmax -> binary paste mask in {0, 255}. ref: face_parsing.py:66-78"""
    labels = jnp.argmax(logits, axis=1)
    lut = jnp.asarray(MASK_COLORMAP, dtype=jnp.float32)
    return lut[labels]
