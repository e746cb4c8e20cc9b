"""Legacy pSp encoders (pixel2style2pixel lineage).

Parity target: src/models/encoders/psp_encoders.py:11-234. These are
selectable-but-unreachable alternatives in the reference (its Net3 asserts
``fsencoder_type in ["psp"]`` and only ever builds FSEncoder_PSP,
ref: src/models/networks.py:47-49); they ship here for component-inventory
completeness (SURVEY §2 #7) with structural tests, not because any released
E4S checkpoint exercises them.

- GradualStyleEncoder: pSp's FPN encoder — IR-50 trunk with taps at body
  indices 6/20/23, top-down lateral fusion (bilinear align_corners=True
  upsample + 1x1 lateral convs), and one GradualStyleBlock per style
  (coarse styles from the 16^2 map, middle from 32^2, fine from 64^2).
- BackboneEncoderUsingLastLayerIntoW: trunk -> global avg pool -> EqualLinear
  -> a single w in W space.
- BackboneEncoderUsingLastLayerIntoWPlus: trunk -> BN + 7x7 adaptive pool ->
  Linear -> EqualLinear(512 * n_styles) -> W+ codes.
- CustomBackboneEncoderUsingLastLayerIntoWPlus: the WPlus variant with
  n_styles=11 and a 1x1 structure head on the body-20 (256-ch) feature map.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from e4s_tpu.models.encoders import (
    BottleneckIRSE,
    Conv,
    FrozenBatchNorm,
    PReLU,
    irse50_blocks,
)
from e4s_tpu.models.layers import EqualLinear
from e4s_tpu.ops.resize import adaptive_avg_pool2d, bilinear_resize


class GradualStyleBlock(nn.Module):
    """spatial^2 feature map -> one 512-d style. ref: psp_encoders.py:11-32"""

    out_c: int
    spatial: int

    @nn.compact
    def __call__(self, x):
        import numpy as np

        num_pools = int(np.log2(self.spatial))
        for i in range(num_pools):
            x = Conv(self.out_c, 3, stride=2, padding=1, name=f"convs_{i}")(x)
            x = jax.nn.leaky_relu(x, 0.01)  # torch nn.LeakyReLU default
        x = x.reshape(-1, self.out_c)
        return EqualLinear(self.out_c, name="linear")(x)


class _IRTrunk(nn.Module):
    """Conv-BN-PReLU input layer + IR(-SE) bottleneck ladder with taps.

    ref: psp_encoders.py:45-55 (input_layer + body); ``mode`` selects
    bottleneck_IR vs bottleneck_IR_SE (helpers.py:74-119).
    """

    mode: str = "ir"  # "ir" | "ir_se"

    @nn.compact
    def __call__(self, x, tap_indices=()):
        x = Conv(64, 3, padding=1, use_bias=False, name="input_conv")(x)
        x = FrozenBatchNorm(64, name="input_bn")(x)
        x = PReLU(64, name="input_prelu")(x)
        taps = {}
        for i, (in_c, depth, stride) in enumerate(irse50_blocks()):
            x = BottleneckIRSE(
                in_c, depth, stride, norm="bn", use_se=self.mode == "ir_se",
                name=f"body_{i}",
            )(x)
            if i in tap_indices:
                taps[i] = x
        return x, taps


class GradualStyleEncoder(nn.Module):
    """pSp FPN encoder -> [B, n_styles, 512]. ref: psp_encoders.py:35-116"""

    n_styles: int = 18
    mode: str = "ir"
    coarse_ind: int = 3
    middle_ind: int = 7

    @nn.compact
    def __call__(self, x):
        _, taps = _IRTrunk(self.mode, name="trunk")(x, tap_indices=(6, 20, 23))
        c1, c2, c3 = taps[6], taps[20], taps[23]

        def upsample_add(top, lateral):
            # bilinear align_corners=True, arbitrary target size
            # (ref: psp_encoders.py:73-90)
            return (
                bilinear_resize(top, lateral.shape[-2:], align_corners=True)
                + lateral
            )

        latents = []
        for j in range(self.coarse_ind):
            latents.append(
                GradualStyleBlock(512, 16, name=f"styles_{j}")(c3)
            )
        p2 = upsample_add(c3, Conv(512, 1, name="latlayer1")(c2))
        for j in range(self.coarse_ind, self.middle_ind):
            latents.append(GradualStyleBlock(512, 32, name=f"styles_{j}")(p2))
        p1 = upsample_add(p2, Conv(512, 1, name="latlayer2")(c1))
        for j in range(self.middle_ind, self.n_styles):
            latents.append(GradualStyleBlock(512, 64, name=f"styles_{j}")(p1))
        return jnp.stack(latents, axis=1)


class BackboneEncoderUsingLastLayerIntoW(nn.Module):
    """trunk -> avgpool(1) -> EqualLinear -> [B, 512].
    ref: psp_encoders.py:119-149"""

    mode: str = "ir"

    @nn.compact
    def __call__(self, x):
        x, _ = _IRTrunk(self.mode, name="trunk")(x)
        x = jnp.mean(x, axis=(-2, -1))
        return EqualLinear(512, name="linear")(x)


class BackboneEncoderUsingLastLayerIntoWPlus(nn.Module):
    """trunk -> BN + avgpool(7) + Linear -> EqualLinear -> [B, n_styles, 512].
    ref: psp_encoders.py:152-187"""

    n_styles: int = 18
    mode: str = "ir"

    @nn.compact
    def __call__(self, x):
        x, _ = _IRTrunk(self.mode, name="trunk")(x)
        x = FrozenBatchNorm(512, name="output_bn")(x)
        x = adaptive_avg_pool2d(x, (7, 7))
        x = x.reshape(x.shape[0], -1)
        w = self.param(
            "output_linear_weight", nn.initializers.normal(0.01),
            (512, 512 * 7 * 7),
        )
        b = self.param("output_linear_bias", nn.initializers.zeros, (512,))
        x = x @ w.T + b
        x = EqualLinear(512 * self.n_styles, name="linear")(x)
        return x.reshape(-1, self.n_styles, 512)


class CustomBackboneEncoderUsingLastLayerIntoWPlus(nn.Module):
    """WPlus variant (n_styles=11) + 1x1 structure head on the body-20 map.
    ref: psp_encoders.py:189-234"""

    n_styles: int = 11
    mode: str = "ir"

    @nn.compact
    def __call__(self, x):
        from e4s_tpu.models.layers import EqualConv2d

        x, taps = _IRTrunk(self.mode, name="trunk")(x, tap_indices=(20,))
        structure_feats = EqualConv2d(512, 1, name="structure_linear")(taps[20])
        x = FrozenBatchNorm(512, name="output_bn")(x)
        x = adaptive_avg_pool2d(x, (7, 7))
        x = x.reshape(x.shape[0], -1)
        w = self.param(
            "output_linear_weight", nn.initializers.normal(0.01),
            (512, 512 * 7 * 7),
        )
        b = self.param("output_linear_bias", nn.initializers.zeros, (512,))
        x = x @ w.T + b
        x = EqualLinear(512 * self.n_styles, name="linear")(x)
        return x.reshape(-1, self.n_styles, 512), structure_feats
