"""BiSeNet face parser (19-class, face-parsing.PyTorch flavour) + wrapper.

Parity targets:
- src/pretrained/face_parsing/model.py (BiSeNet with ResNet18 context path,
  ARM, FFM; the spatial path is replaced by the res8 feature).
- src/pretrained/face_parsing/resnet.py (ResNet18 trunk).
- src/pretrained/face_parsing/face_parsing_demo.py:15-84 (the exact separable
  bicubic 1024->512 downsampler), :127-175 (FaceParser wrapper), :188-209
  (19->12 class conversion).
"""

from __future__ import annotations

import functools
import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from e4s_tpu.models.encoders import Conv, FrozenBatchNorm
from e4s_tpu.ops.resize import bilinear_resize, nearest_resize

SEG_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32).reshape(1, 3, 1, 1)
SEG_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32).reshape(1, 3, 1, 1)


class ConvBNReLU(nn.Module):
    """ref: model.py:20-40"""

    out_chan: int
    ks: int = 3
    stride: int = 1
    padding: int = 1

    @nn.compact
    def __call__(self, x):
        x = Conv(
            self.out_chan, self.ks, stride=self.stride, padding=self.padding,
            use_bias=False, name="conv",
        )(x)
        x = FrozenBatchNorm(self.out_chan, name="bn")(x)
        return jax.nn.relu(x)


class BiSeNetOutput(nn.Module):
    """ref: model.py:42-57"""

    mid_chan: int
    n_classes: int

    @nn.compact
    def __call__(self, x):
        x = ConvBNReLU(self.mid_chan, name="conv")(x)
        return Conv(self.n_classes, 1, padding=0, use_bias=False, name="conv_out")(x)


class AttentionRefinementModule(nn.Module):
    """ref: model.py:73-92"""

    out_chan: int

    @nn.compact
    def __call__(self, x):
        feat = ConvBNReLU(self.out_chan, name="conv")(x)
        atten = jnp.mean(feat, axis=(-2, -1), keepdims=True)
        atten = Conv(self.out_chan, 1, padding=0, use_bias=False, name="conv_atten")(atten)
        atten = FrozenBatchNorm(self.out_chan, name="bn_atten")(atten)
        return feat * jax.nn.sigmoid(atten)


class BasicBlock(nn.Module):
    """ref: resnet.py:21-48"""

    out_chan: int
    stride: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x):
        res = Conv(self.out_chan, 3, stride=self.stride, padding=1,
                   use_bias=False, name="conv1")(x)
        res = jax.nn.relu(FrozenBatchNorm(self.out_chan, name="bn1")(res))
        res = Conv(self.out_chan, 3, padding=1, use_bias=False, name="conv2")(res)
        res = FrozenBatchNorm(self.out_chan, name="bn2")(res)
        shortcut = x
        if self.has_downsample:
            shortcut = Conv(self.out_chan, 1, stride=self.stride, padding=0,
                            use_bias=False, name="downsample_conv")(x)
            shortcut = FrozenBatchNorm(self.out_chan, name="downsample_bn")(shortcut)
        return jax.nn.relu(shortcut + res)


def _max_pool_3_2_pad1(x):
    """torch MaxPool2d(kernel_size=3, stride=2, padding=1)."""
    xp = jnp.pad(
        x, ((0, 0), (0, 0), (1, 1), (1, 1)), constant_values=-jnp.inf
    )
    return lax.reduce_window(
        xp, -jnp.inf, lax.max, (1, 1, 3, 3), (1, 1, 2, 2), "VALID"
    )


class Resnet18(nn.Module):
    """ref: resnet.py:58-86. Returns (feat8, feat16, feat32)."""

    @nn.compact
    def __call__(self, x):
        x = Conv(64, 7, stride=2, padding=3, use_bias=False, name="conv1")(x)
        x = jax.nn.relu(FrozenBatchNorm(64, name="bn1")(x))
        x = _max_pool_3_2_pad1(x)
        specs = [
            ("layer1", 64, 1), ("layer2", 128, 2),
            ("layer3", 256, 2), ("layer4", 512, 2),
        ]
        feats = []
        in_chan = 64
        for name, out_chan, stride in specs:
            x = BasicBlock(
                out_chan, stride,
                has_downsample=(in_chan != out_chan or stride != 1),
                name=f"{name}_0",
            )(x)
            x = BasicBlock(out_chan, 1, name=f"{name}_1")(x)
            in_chan = out_chan
            feats.append(x)
        return feats[1], feats[2], feats[3]


class ContextPath(nn.Module):
    """ref: model.py:97-130"""

    @nn.compact
    def __call__(self, x):
        feat8, feat16, feat32 = Resnet18(name="resnet")(x)
        H8, W8 = feat8.shape[-2:]
        H16, W16 = feat16.shape[-2:]
        H32, W32 = feat32.shape[-2:]

        avg = jnp.mean(feat32, axis=(-2, -1), keepdims=True)
        avg = ConvBNReLU(128, ks=1, padding=0, name="conv_avg")(avg)
        avg_up = jnp.broadcast_to(avg, avg.shape[:2] + (H32, W32))

        feat32_arm = AttentionRefinementModule(128, name="arm32")(feat32)
        feat32_sum = feat32_arm + avg_up
        feat32_up = nearest_resize(feat32_sum, (H16, W16))
        feat32_up = ConvBNReLU(128, name="conv_head32")(feat32_up)

        feat16_arm = AttentionRefinementModule(128, name="arm16")(feat16)
        feat16_sum = feat16_arm + feat32_up
        feat16_up = nearest_resize(feat16_sum, (H8, W8))
        feat16_up = ConvBNReLU(128, name="conv_head16")(feat16_up)

        return feat8, feat16_up, feat32_up


class FeatureFusionModule(nn.Module):
    """ref: model.py:186-216"""

    out_chan: int = 256

    @nn.compact
    def __call__(self, fsp, fcp):
        fcat = jnp.concatenate([fsp, fcp], axis=1)
        feat = ConvBNReLU(self.out_chan, ks=1, padding=0, name="convblk")(fcat)
        atten = jnp.mean(feat, axis=(-2, -1), keepdims=True)
        atten = Conv(self.out_chan // 4, 1, padding=0, use_bias=False, name="conv1")(atten)
        atten = jax.nn.relu(atten)
        atten = Conv(self.out_chan, 1, padding=0, use_bias=False, name="conv2")(atten)
        atten = jax.nn.sigmoid(atten)
        return feat * atten + feat


class BiSeNet(nn.Module):
    """ref: model.py:238-268. forward -> (out, out16, out32) logits at input res."""

    n_classes: int = 19

    @nn.compact
    def __call__(self, x):
        H, W = x.shape[-2:]
        feat_res8, feat_cp8, feat_cp16 = ContextPath(name="cp")(x)
        feat_fuse = FeatureFusionModule(256, name="ffm")(feat_res8, feat_cp8)
        out = BiSeNetOutput(256, self.n_classes, name="conv_out")(feat_fuse)
        out16 = BiSeNetOutput(64, self.n_classes, name="conv_out16")(feat_cp8)
        out32 = BiSeNetOutput(64, self.n_classes, name="conv_out32")(feat_cp16)
        out = bilinear_resize(out, (H, W), align_corners=True)
        out16 = bilinear_resize(out16, (H, W), align_corners=True)
        out32 = bilinear_resize(out32, (H, W), align_corners=True)
        return out, out16, out32


# ---------------------------------------------------------------------------
# Bicubic downsampler + FaceParser wrapper
# ---------------------------------------------------------------------------


def _bicubic_kernel_1d(factor: int, a: float = -0.5) -> np.ndarray:
    """ref: face_parsing_demo.py:16-35"""
    size = factor * 4

    def k(x):
        ax = abs(x)
        if ax <= 1.0:
            return (a + 2.0) * ax**3 - (a + 3.0) * ax**2 + 1.0
        elif 1.0 < ax < 2.0:
            return a * ax**3 - 5.0 * a * ax**2 + 8.0 * a * ax - 4.0 * a
        return 0.0

    taps = np.array(
        [k((i - math.floor(size / 2) + 0.5) / factor) for i in range(size)],
        dtype=np.float32,
    )
    return taps / taps.sum()


def bicubic_downsample(x: jnp.ndarray, factor: int, clip_round: bool = False):
    """Separable bicubic FIR downsample with reflect padding, exact parity
    with BicubicDownSample (ref: face_parsing_demo.py:46-84). x: [B,C,H,W]."""
    if factor == 1:
        return x
    C = x.shape[1]
    taps = jnp.asarray(_bicubic_kernel_1d(factor), dtype=x.dtype)
    size = factor * 4
    pad = size - factor
    pad0, pad1 = pad // 2, pad - pad // 2

    xp = jnp.pad(x, ((0, 0), (0, 0), (pad0, pad1), (0, 0)), mode="reflect")
    kv = jnp.broadcast_to(taps[:, None, None, None], (size, 1, 1, C))
    x = lax.conv_general_dilated(
        xp, kv, (factor, 1), "VALID",
        dimension_numbers=("NCHW", "HWIO", "NCHW"), feature_group_count=C,
    )
    if clip_round:
        x = jnp.clip(jnp.round(x), 0.0, 255.0)
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (pad0, pad1)), mode="reflect")
    kh = jnp.broadcast_to(taps[None, :, None, None], (1, size, 1, C))
    x = lax.conv_general_dilated(
        xp, kh, (1, factor), "VALID",
        dimension_numbers=("NCHW", "HWIO", "NCHW"), feature_group_count=C,
    )
    if clip_round:
        x = jnp.clip(jnp.round(x), 0.0, 255.0)
    return x


class FaceParser:
    """Host-facing parser wrapper (ref: face_parsing_demo.py:127-175).

    __call__(img01 [B,3,S,S] in [0,1]) -> [B,S512,S512] int32 19-cls labels.
    """

    taxonomy = "ffhq19"  # face-parsing.PyTorch label order

    def __init__(self, variables=None, size: int = 1024, rng_seed: int = 0):
        self.size = size
        self.model = BiSeNet(n_classes=19)
        if variables is None:
            x0 = jnp.zeros((1, 3, 512, 512), jnp.float32)
            variables = jax.jit(self.model.init)(
                jax.random.PRNGKey(rng_seed), x0
            )
        self.variables = variables
        # variables passed as an argument (not closed over) so the weights
        # are not embedded as constants in the serialized program
        self._jit_forward = jax.jit(self._forward)

    def _forward(self, variables, img01):
        if img01.shape[-1] >= 512:
            im = bicubic_downsample(img01, img01.shape[-1] // 512)
            im = jnp.clip(im, 0.0, 1.0)
        else:
            im = bilinear_resize(img01, (512, 512))
            im = jnp.clip(im, 0.0, 1.0)
        im = (im - jnp.asarray(SEG_MEAN)) / jnp.asarray(SEG_STD)
        out, _, _ = self.model.apply(variables, im)
        return jnp.argmax(out, axis=1).astype(jnp.int32)

    def __call__(self, img01):
        return self._jit_forward(self.variables, img01)


def face_parsing_demo(parser: FaceParser, img01, convert_to_seg12: bool = True):
    """ref: face_parsing_demo.py:188-209 (default model path)."""
    from e4s_tpu.datasets.dataset import ffhq_mask_to_faceparser_mask_detailed

    seg = np.asarray(parser(img01)).astype(np.uint8)
    if convert_to_seg12:
        seg = np.stack(
            [ffhq_mask_to_faceparser_mask_detailed(s) for s in seg]
        )
    return seg
