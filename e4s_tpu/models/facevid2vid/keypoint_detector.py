"""Canonical 3-D keypoint detector + head-pose/expression estimator.

Parity target: src/pretrained/face_vid2vid/modules/keypoint_detector.py
(vox-256 config: num_kp=15, estimate_jacobian=False, scale_factor=0.25).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from e4s_tpu.models.encoders import Conv, FrozenBatchNorm
from e4s_tpu.models.facevid2vid.util import (
    Conv3D,
    KPHourglass,
    ResBottleneck,
    anti_alias_interpolation,
    make_coordinate_grid_3d,
)


class KPDetector(nn.Module):
    """ref: keypoint_detector.py:9-82. Returns kp value [B, num_kp, 3]."""

    block_expansion: int = 32
    num_kp: int = 15
    image_channel: int = 3
    max_features: int = 1024
    reshape_channel: int = 16384
    reshape_depth: int = 16
    num_blocks: int = 5
    temperature: float = 0.1
    scale_factor: float = 0.25

    @nn.compact
    def __call__(self, x):
        if self.scale_factor != 1:
            x = anti_alias_interpolation(x, self.scale_factor)
        feature_map = KPHourglass(
            self.block_expansion,
            reshape_features=self.reshape_channel,
            reshape_depth=self.reshape_depth,
            num_blocks=self.num_blocks,
            max_features=self.max_features,
            name="predictor",
        )(x)
        prediction = Conv3D(self.num_kp, 3, padding=1, name="kp")(feature_map)

        B, K, D, H, W = prediction.shape
        heatmap = jax.nn.softmax(
            prediction.reshape(B, K, -1) / self.temperature, axis=2
        ).reshape(B, K, D, H, W)
        grid = make_coordinate_grid_3d(D, H, W, heatmap.dtype)  # [D,H,W,3]
        value = jnp.einsum("bkdhw,dhwc->bkc", heatmap, grid)
        return {"value": value}


class HEEstimator(nn.Module):
    """Head-pose (binned yaw/pitch/roll) + translation + expression.

    ref: keypoint_detector.py:85-178. Note the reference swaps the yaw/roll
    head names in forward (yaw=fc_roll etc., :172-174) — reproduced exactly
    since the pretrained weights bake that in.
    """

    block_expansion: int = 64
    num_kp: int = 15
    image_channel: int = 3
    max_features: int = 2048
    num_bins: int = 66

    @nn.compact
    def __call__(self, x):
        from e4s_tpu.models.bisenet import _max_pool_3_2_pad1

        out = Conv(self.block_expansion, 7, stride=2, padding=3, name="conv1")(x)
        out = FrozenBatchNorm(self.block_expansion, name="norm1")(out)
        out = jax.nn.relu(out)
        out = _max_pool_3_2_pad1(out)

        out = Conv(256, 1, name="conv2")(out)
        out = FrozenBatchNorm(256, name="norm2")(out)
        out = jax.nn.relu(out)
        for i in range(3):
            out = ResBottleneck(256, 1, name=f"block1_{i}")(out)

        out = Conv(512, 1, name="conv3")(out)
        out = FrozenBatchNorm(512, name="norm3")(out)
        out = jax.nn.relu(out)
        out = ResBottleneck(512, 2, name="block2")(out)
        for i in range(3):
            out = ResBottleneck(512, 1, name=f"block3_{i}")(out)

        out = Conv(1024, 1, name="conv4")(out)
        out = FrozenBatchNorm(1024, name="norm4")(out)
        out = jax.nn.relu(out)
        out = ResBottleneck(1024, 2, name="block4")(out)
        for i in range(5):
            out = ResBottleneck(1024, 1, name=f"block5_{i}")(out)

        out = Conv(2048, 1, name="conv5")(out)
        out = FrozenBatchNorm(2048, name="norm5")(out)
        out = jax.nn.relu(out)
        out = ResBottleneck(2048, 2, name="block6")(out)
        for i in range(2):
            out = ResBottleneck(2048, 1, name=f"block7_{i}")(out)

        out = jnp.mean(out, axis=(-2, -1))

        def linear(name, n):
            w = self.param(
                f"{name}_weight", nn.initializers.normal(0.01), (n, 2048)
            )
            b = self.param(f"{name}_bias", nn.initializers.zeros, (n,))
            return out @ w.T + b

        # reference name swap preserved (ref: keypoint_detector.py:172-174)
        return {
            "yaw": linear("fc_roll", self.num_bins),
            "pitch": linear("fc_pitch", self.num_bins),
            "roll": linear("fc_yaw", self.num_bins),
            "t": linear("fc_t", 3),
            "exp": linear("fc_exp", 3 * self.num_kp),
        }
