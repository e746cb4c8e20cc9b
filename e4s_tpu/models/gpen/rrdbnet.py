"""RRDBNet (RealESRNet x4 super-resolution trunk).

Parity target: src/pretrained/gpen/sr_model/rrdbnet_arch.py (num_feat=32,
num_block=23 per the E4S GPEN config, ref: sr_model/real_esrnet.py:16).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from e4s_tpu.models.encoders import Conv


def pixel_unshuffle(x, scale: int):
    """ref: sr_model/arch_util.py (space-to-depth)."""
    B, C, H, W = x.shape
    x = x.reshape(B, C, H // scale, scale, W // scale, scale)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4))
    return x.reshape(B, C * scale * scale, H // scale, W // scale)


def _up2_nearest(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=-2), 2, axis=-1)


class ResidualDenseBlock(nn.Module):
    """ref: rrdbnet_arch.py:8-39"""

    num_feat: int = 32
    num_grow_ch: int = 32

    @nn.compact
    def __call__(self, x):
        lrelu = lambda v: jax.nn.leaky_relu(v, 0.2)
        x1 = lrelu(Conv(self.num_grow_ch, 3, padding=1, name="conv1")(x))
        x2 = lrelu(Conv(self.num_grow_ch, 3, padding=1, name="conv2")(
            jnp.concatenate([x, x1], 1)))
        x3 = lrelu(Conv(self.num_grow_ch, 3, padding=1, name="conv3")(
            jnp.concatenate([x, x1, x2], 1)))
        x4 = lrelu(Conv(self.num_grow_ch, 3, padding=1, name="conv4")(
            jnp.concatenate([x, x1, x2, x3], 1)))
        x5 = Conv(self.num_feat, 3, padding=1, name="conv5")(
            jnp.concatenate([x, x1, x2, x3, x4], 1))
        return x5 * 0.2 + x


class RRDB(nn.Module):
    """ref: rrdbnet_arch.py:42-64"""

    num_feat: int = 32
    num_grow_ch: int = 32

    @nn.compact
    def __call__(self, x):
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch, name="rdb1")(x)
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch, name="rdb2")(out)
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch, name="rdb3")(out)
        return out * 0.2 + x


class RRDBNet(nn.Module):
    """ref: rrdbnet_arch.py:66-116"""

    num_out_ch: int = 3
    scale: int = 4
    num_feat: int = 32
    num_block: int = 23
    num_grow_ch: int = 32

    @nn.compact
    def __call__(self, x):
        if self.scale == 2:
            feat = pixel_unshuffle(x, 2)
        elif self.scale == 1:
            feat = pixel_unshuffle(x, 4)
        else:
            feat = x
        lrelu = lambda v: jax.nn.leaky_relu(v, 0.2)
        feat = Conv(self.num_feat, 3, padding=1, name="conv_first")(feat)
        body = feat
        for i in range(self.num_block):
            body = RRDB(self.num_feat, self.num_grow_ch, name=f"body_{i}")(body)
        body = Conv(self.num_feat, 3, padding=1, name="conv_body")(body)
        feat = feat + body
        feat = lrelu(Conv(self.num_feat, 3, padding=1, name="conv_up1")(_up2_nearest(feat)))
        feat = lrelu(Conv(self.num_feat, 3, padding=1, name="conv_up2")(_up2_nearest(feat)))
        out = Conv(self.num_out_ch, 3, padding=1, name="conv_last")(
            lrelu(Conv(self.num_feat, 3, padding=1, name="conv_hr")(feat))
        )
        return out
