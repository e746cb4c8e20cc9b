"""Occlusion-aware SPADE generator (the one E4S uses, gen="spade").

Parity target: src/pretrained/face_vid2vid/modules/generator.py:121-252.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from e4s_tpu.models.encoders import Conv
from e4s_tpu.models.facevid2vid.dense_motion import DenseMotionNetwork
from e4s_tpu.models.facevid2vid.util import (
    DownBlock2d,
    ResBlock3d,
    SameBlock2d,
    SPADEResnetBlock,
    upsample_nearest_2d,
)
from e4s_tpu.ops.resize import bilinear_resize
from e4s_tpu.ops.warp import grid_sample_3d


class SPADEDecoder(nn.Module):
    """ref: generator.py:121-159"""

    @nn.compact
    def __call__(self, feature):
        ic, oc, label_nc = 256, 64, 256
        seg = feature
        x = Conv(2 * ic, 3, padding=1, name="fc")(feature)
        for i in range(6):
            x = SPADEResnetBlock(2 * ic, 2 * ic, label_nc, name=f"G_middle_{i}")(x, seg)
        x = upsample_nearest_2d(x)
        x = SPADEResnetBlock(2 * ic, ic, label_nc, name="up_0")(x, seg)
        x = upsample_nearest_2d(x)
        x = SPADEResnetBlock(ic, oc, label_nc, name="up_1")(x, seg)
        x = Conv(3, 3, padding=1, name="conv_img")(jax.nn.leaky_relu(x, 0.2))
        return jax.nn.sigmoid(x)


class OcclusionAwareSPADEGenerator(nn.Module):
    """ref: generator.py:162-252 (vox-256: block 64, max 512, down 2,
    reshape 32x16, resblocks 6, occlusion on)."""

    image_channel: int = 3
    feature_channel: int = 32
    num_kp: int = 15
    block_expansion: int = 64
    max_features: int = 512
    num_down_blocks: int = 2
    reshape_channel: int = 32
    reshape_depth: int = 16
    num_resblocks: int = 6
    estimate_occlusion_map: bool = True

    def setup(self):
        self.dense_motion_network = DenseMotionNetwork(
            num_kp=self.num_kp,
            feature_channel=self.feature_channel,
            estimate_occlusion_map=self.estimate_occlusion_map,
            reshape_depth=self.reshape_depth,
            name="dense_motion_network",
        )
        self.first = SameBlock2d(self.block_expansion, name="first")
        downs = []
        for i in range(self.num_down_blocks):
            out_f = min(self.max_features, self.block_expansion * (2 ** (i + 1)))
            downs.append(DownBlock2d(out_f, name=f"down_blocks_{i}"))
        self.down_blocks = downs
        self.second = Conv(self.max_features, 1, name="second")
        self.resblocks_3d = [
            ResBlock3d(self.reshape_channel, name=f"resblocks_3d_{i}")
            for i in range(self.num_resblocks)
        ]
        out_f = self.block_expansion * (2**self.num_down_blocks)
        self.third = SameBlock2d(out_f, lrelu=True, name="third")
        self.fourth = Conv(out_f, 1, name="fourth")
        self.decoder = SPADEDecoder(name="decoder")

    def deform_input(self, inp, deformation):
        """ref: generator.py:202-209"""
        return grid_sample_3d(inp, deformation)

    def __call__(self, source_image, kp_driving, kp_source):
        out = self.first(source_image)
        for blk in self.down_blocks:
            out = blk(out)
        out = self.second(out)
        bs, c, h, w = out.shape
        feature_3d = out.reshape(
            bs, self.reshape_channel, self.reshape_depth, h, w
        )
        for blk in self.resblocks_3d:
            feature_3d = blk(feature_3d)

        output = {}
        dense_motion = self.dense_motion_network(
            feature_3d, kp_driving, kp_source
        )
        output["mask"] = dense_motion["mask"]
        occlusion_map = dense_motion.get("occlusion_map")
        if occlusion_map is not None:
            output["occlusion_map"] = occlusion_map
        out = self.deform_input(feature_3d, dense_motion["deformation"])
        bs, c, d, h, w = out.shape
        out = out.reshape(bs, c * d, h, w)
        out = self.third(out)
        out = self.fourth(out)
        if occlusion_map is not None:
            if out.shape[2:] != occlusion_map.shape[2:]:
                occlusion_map = bilinear_resize(occlusion_map, out.shape[2:])
            out = out * occlusion_map

        output["prediction"] = self.decoder(out)
        return output
