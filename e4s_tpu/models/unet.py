"""19-class face-parsing U-Net used by the parsing loss (frozen aux net).

Parity target: src/criteria/face_parsing/unet.py:6-93 with
unetConv2/unetUp from src/criteria/face_parsing/model_utils.py:177-221.
feature_scale=4 -> filters [16, 32, 64, 128, 256].
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from e4s_tpu.models.encoders import Conv, FrozenBatchNorm
from e4s_tpu.ops import conv as convops


def max_pool2(x):
    """torch nn.MaxPool2d(kernel_size=2) (stride=kernel_size)."""
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
    )


class UnetConv2(nn.Module):
    """conv-BN-ReLU x2. ref: model_utils.py:177-203"""

    out_size: int
    is_batchnorm: bool = True

    @nn.compact
    def __call__(self, x):
        for idx in (1, 2):
            x = Conv(self.out_size, 3, padding=1, name=f"conv{idx}")(x)
            if self.is_batchnorm:
                x = FrozenBatchNorm(self.out_size, name=f"bn{idx}")(x)
            x = jax.nn.relu(x)
        return x


class UnetUp(nn.Module):
    """ConvTranspose2d(k2,s2) up + concat + UnetConv2.

    ref: model_utils.py:206-221
    """

    in_size: int
    out_size: int

    @nn.compact
    def __call__(self, skip, x):
        w = self.param(
            "up_weight",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (self.in_size, self.out_size, 2, 2),
        )
        b = self.param("up_bias", nn.initializers.zeros, (self.out_size,))
        up = convops.conv_transpose2d(x, w, bias=b, stride=2, padding=0)
        # offset padding is 0 for power-of-two inputs (our only use: 512^2)
        return UnetConv2(self.out_size, name="conv")(
            jnp.concatenate([skip, up], axis=1)
        )


class ParsingUNet(nn.Module):
    """ref: src/criteria/face_parsing/unet.py:6-93"""

    feature_scale: int = 4
    n_classes: int = 19

    def _filters(self):
        return [int(f / self.feature_scale) for f in (64, 128, 256, 512, 1024)]

    @nn.compact
    def __call__(self, x, extract_feats_only: bool = False):
        f = self._filters()

        def l2n(v):
            return v / jnp.linalg.norm(v, axis=1, keepdims=True)

        conv1 = UnetConv2(f[0], name="conv1")(x)
        conv2 = UnetConv2(f[1], name="conv2")(max_pool2(conv1))
        conv3 = UnetConv2(f[2], name="conv3")(max_pool2(conv2))
        conv4 = UnetConv2(f[3], name="conv4")(max_pool2(conv3))
        center = UnetConv2(f[4], name="center")(max_pool2(conv4))

        if extract_feats_only:
            bs = x.shape[0]
            return [
                l2n(t.reshape(bs, -1))
                for t in (conv1, conv2, conv3, conv4, center)
            ]

        up4 = UnetUp(f[4], f[3], name="up_concat4")(conv4, center)
        up3 = UnetUp(f[3], f[2], name="up_concat3")(conv3, up4)
        up2 = UnetUp(f[2], f[1], name="up_concat2")(conv2, up3)
        up1 = UnetUp(f[1], f[0], name="up_concat1")(conv1, up2)
        return Conv(self.n_classes, 1, name="final")(up1)
