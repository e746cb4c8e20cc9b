"""Dense motion network: sparse 3-D motions -> dense deformation + occlusion.

Parity target: src/pretrained/face_vid2vid/modules/dense_motion.py.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from e4s_tpu.models.encoders import Conv, FrozenBatchNorm
from e4s_tpu.models.facevid2vid.util import (
    Conv3D,
    Hourglass3D,
    kp2gaussian,
    make_coordinate_grid_3d,
)
from e4s_tpu.ops.warp import grid_sample_3d


class DenseMotionNetwork(nn.Module):
    """ref: dense_motion.py:9-128 (vox-256: block 32, blocks 5, max 1024,
    compress 4, reshape_depth 16, occlusion on)."""

    block_expansion: int = 32
    num_blocks: int = 5
    max_features: int = 1024
    num_kp: int = 15
    feature_channel: int = 32
    reshape_depth: int = 16
    compress: int = 4
    estimate_occlusion_map: bool = True

    def create_sparse_motions(self, feature, kp_driving, kp_source):
        """ref: dense_motion.py:34-69 (jacobians disabled in vox-256)."""
        bs, _, d, h, w = feature.shape
        identity_grid = make_coordinate_grid_3d(d, h, w, feature.dtype)
        identity_grid = identity_grid[None, None]  # [1,1,d,h,w,3]
        coordinate_grid = identity_grid - kp_driving["value"].reshape(
            bs, self.num_kp, 1, 1, 1, 3
        )
        driving_to_source = coordinate_grid + kp_source["value"].reshape(
            bs, self.num_kp, 1, 1, 1, 3
        )
        identity_grid = jnp.broadcast_to(identity_grid, (bs, 1, d, h, w, 3))
        return jnp.concatenate([identity_grid, driving_to_source], axis=1)

    def create_deformed_feature(self, feature, sparse_motions):
        """ref: dense_motion.py:71-78"""
        bs, c, d, h, w = feature.shape
        K1 = self.num_kp + 1
        feat = jnp.broadcast_to(feature[:, None], (bs, K1, c, d, h, w))
        feat = feat.reshape(bs * K1, c, d, h, w)
        grids = sparse_motions.reshape(bs * K1, d, h, w, 3)
        deformed = grid_sample_3d(feat, grids)
        return deformed.reshape(bs, K1, c, d, h, w)

    def create_heatmap_representations(self, feature, kp_driving, kp_source):
        """ref: dense_motion.py:80-90"""
        spatial = feature.shape[3:]
        g_driving = kp2gaussian(kp_driving["value"], spatial, 0.01)
        g_source = kp2gaussian(kp_source["value"], spatial, 0.01)
        heatmap = g_driving - g_source
        zeros = jnp.zeros(
            (heatmap.shape[0], 1) + tuple(spatial), heatmap.dtype
        )
        heatmap = jnp.concatenate([zeros, heatmap], axis=1)
        return heatmap[:, :, None]  # [bs, K+1, 1, d, h, w]

    @nn.compact
    def __call__(self, feature, kp_driving, kp_source):
        bs, _, d, h, w = feature.shape
        feature = Conv3D(self.compress, 1, name="compress")(feature)
        feature = FrozenBatchNorm(self.compress, name="norm")(feature)
        feature = jax.nn.relu(feature)

        out = {}
        sparse_motion = self.create_sparse_motions(feature, kp_driving, kp_source)
        deformed_feature = self.create_deformed_feature(feature, sparse_motion)
        heatmap = self.create_heatmap_representations(
            deformed_feature, kp_driving, kp_source
        )
        inp = jnp.concatenate([heatmap, deformed_feature], axis=2)
        inp = inp.reshape(bs, -1, d, h, w)

        hourglass = Hourglass3D(
            self.block_expansion,
            in_features=(self.num_kp + 1) * (self.compress + 1),
            num_blocks=self.num_blocks,
            max_features=self.max_features,
            name="hourglass",
        )
        prediction = hourglass(inp)

        mask = Conv3D(self.num_kp + 1, 7, padding=3, name="mask")(prediction)
        mask = jax.nn.softmax(mask, axis=1)
        out["mask"] = mask
        # deformation[b,d,h,w,:] = sum_k mask[b,k,d,h,w] * motion[b,k,d,h,w,:]
        deformation = jnp.sum(sparse_motion * mask[..., None], axis=1)
        out["deformation"] = deformation

        if self.estimate_occlusion_map:
            pred2d = prediction.reshape(bs, -1, h, w)
            occ = Conv(1, 7, padding=3, name="occlusion")(pred2d)
            out["occlusion_map"] = jax.nn.sigmoid(occ)
        return out
