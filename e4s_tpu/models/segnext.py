"""SegNeXt face parser: MSCAN backbone + LightHamHead (NMF Hamburger).

Parity target: the reference's alternative parser loaded through mmseg
(ref: src/pretrained/face_parsing/face_parsing_demo.py:182-186, configs under
pretrained_ckpts/face_parsing/segnext.*.py). Architecture follows the public
SegNeXt release ("SegNeXt: Rethinking Convolutional Attention Design for
Semantic Segmentation", NeurIPS 2022): multi-scale strip-conv attention
blocks, and a LightHamHead whose Hamburger module runs multiplicative-update
NMF — expressed here as a fixed-length lax.fori-style unrolled loop, fully
jittable.

Size variants (ref: segnext.{tiny,small,base,large} configs):
  tiny : dims [32, 64, 160, 256],  depths [3, 3, 5, 2]
  small: dims [64, 128, 320, 512], depths [2, 2, 4, 2]
  base : dims [64, 128, 320, 512], depths [3, 3, 12, 3]
  large: dims [64, 128, 320, 512], depths [3, 5, 27, 3]
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from e4s_tpu.models.encoders import Conv, FrozenBatchNorm
from e4s_tpu.ops import conv as convops
from e4s_tpu.ops.resize import bilinear_resize

SEGNEXT_VARIANTS = {
    "tiny": dict(embed_dims=(32, 64, 160, 256), depths=(3, 3, 5, 2),
                 mlp_ratios=(8, 8, 4, 4), head_in=(64, 160, 256), ham_channels=256),
    "small": dict(embed_dims=(64, 128, 320, 512), depths=(2, 2, 4, 2),
                  mlp_ratios=(8, 8, 4, 4), head_in=(128, 320, 512), ham_channels=256),
    "base": dict(embed_dims=(64, 128, 320, 512), depths=(3, 3, 12, 3),
                 mlp_ratios=(8, 8, 4, 4), head_in=(128, 320, 512), ham_channels=512),
    "large": dict(embed_dims=(64, 128, 320, 512), depths=(3, 5, 27, 3),
                  mlp_ratios=(8, 8, 4, 4), head_in=(128, 320, 512), ham_channels=1024),
}

# mmseg normalization for this config (segnext config img_norm_cfg)
SEGNEXT_MEAN = (123.675, 116.28, 103.53)
SEGNEXT_STD = (58.395, 57.12, 57.375)


def _dwconv(x, weight, bias=None):
    C = x.shape[1]
    return convops.conv2d(
        x, weight, bias=bias,
        padding=0, groups=C,
    )


class DWConv(nn.Module):
    """Depthwise conv with (kh, kw) kernel and same padding."""

    kh: int
    kw: int

    @nn.compact
    def __call__(self, x):
        C = x.shape[1]
        w = self.param(
            "weight",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (C, 1, self.kh, self.kw),
        )
        b = self.param("bias", nn.initializers.zeros, (C,))
        from jax import lax

        out = lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1),
            ((self.kh // 2, self.kh // 2), (self.kw // 2, self.kw // 2)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=C,
        )
        return out + b.reshape(1, -1, 1, 1).astype(out.dtype)


class MSCAAttention(nn.Module):
    """Multi-scale convolutional attention (strip convs 7/11/21)."""

    @nn.compact
    def __call__(self, x):
        u = x
        attn = DWConv(5, 5, name="conv0")(x)
        a0 = DWConv(1, 7, name="conv0_1")(attn)
        a0 = DWConv(7, 1, name="conv0_2")(a0)
        a1 = DWConv(1, 11, name="conv1_1")(attn)
        a1 = DWConv(11, 1, name="conv1_2")(a1)
        a2 = DWConv(1, 21, name="conv2_1")(attn)
        a2 = DWConv(21, 1, name="conv2_2")(a2)
        attn = attn + a0 + a1 + a2
        attn = Conv(x.shape[1], 1, name="conv3")(attn)
        return attn * u


class MSCABlock(nn.Module):
    dim: int
    mlp_ratio: int

    @nn.compact
    def __call__(self, x):
        ls1 = self.param(
            "layer_scale_1", lambda k: jnp.full((self.dim,), 1e-2, jnp.float32)
        )
        ls2 = self.param(
            "layer_scale_2", lambda k: jnp.full((self.dim,), 1e-2, jnp.float32)
        )
        # attention branch
        h = FrozenBatchNorm(self.dim, name="norm1")(x)
        h = Conv(self.dim, 1, name="attn_proj_1")(h)
        h = jax.nn.gelu(h)
        h = MSCAAttention(name="attn_spatial")(h)
        h = Conv(self.dim, 1, name="attn_proj_2")(h)
        x = x + ls1.reshape(1, -1, 1, 1) * h
        # mlp branch
        h = FrozenBatchNorm(self.dim, name="norm2")(x)
        h = Conv(self.dim * self.mlp_ratio, 1, name="mlp_fc1")(h)
        h = DWConv(3, 3, name="mlp_dwconv")(h)
        h = jax.nn.gelu(h)
        h = Conv(self.dim, 1, name="mlp_fc2")(h)
        return x + ls2.reshape(1, -1, 1, 1) * h


class MSCAN(nn.Module):
    """4-stage hierarchical backbone; returns the 4 stage feature maps."""

    embed_dims: Sequence[int] = (64, 128, 320, 512)
    depths: Sequence[int] = (2, 2, 4, 2)
    mlp_ratios: Sequence[int] = (8, 8, 4, 4)

    @nn.compact
    def __call__(self, x):
        feats = []
        for stage in range(4):
            dim = self.embed_dims[stage]
            if stage == 0:
                # StemConv: two stride-2 convs (total /4)
                x = Conv(dim // 2, 3, stride=2, padding=1, name="stem_conv1")(x)
                x = FrozenBatchNorm(dim // 2, name="stem_bn1")(x)
                x = jax.nn.gelu(x)
                x = Conv(dim, 3, stride=2, padding=1, name="stem_conv2")(x)
                x = FrozenBatchNorm(dim, name="stem_bn2")(x)
            else:
                x = Conv(dim, 3, stride=2, padding=1, name=f"patch_embed{stage + 1}_proj")(x)
                x = FrozenBatchNorm(dim, name=f"patch_embed{stage + 1}_norm")(x)
            for b in range(self.depths[stage]):
                x = MSCABlock(dim, self.mlp_ratios[stage], name=f"block{stage + 1}_{b}")(x)
            # per-stage LayerNorm over channels
            gamma = self.param(f"norm{stage + 1}_weight", nn.initializers.ones, (dim,))
            beta = self.param(f"norm{stage + 1}_bias", nn.initializers.zeros, (dim,))
            mean = jnp.mean(x, axis=1, keepdims=True)
            var = jnp.var(x, axis=1, keepdims=True)
            x = (x - mean) * jax.lax.rsqrt(var + 1e-5)  # nn.LayerNorm eps
            x = x * gamma.reshape(1, -1, 1, 1) + beta.reshape(1, -1, 1, 1)
            feats.append(x)
        return feats


class GroupNorm32(nn.Module):
    channels: int
    groups: int = 32

    @nn.compact
    def __call__(self, x):
        B, C, H, W = x.shape
        g = self.groups
        xr = x.reshape(B, g, C // g, H, W)
        mean = jnp.mean(xr, axis=(2, 3, 4), keepdims=True)
        var = jnp.var(xr, axis=(2, 3, 4), keepdims=True)
        xr = (xr - mean) * jax.lax.rsqrt(var + 1e-5)
        x = xr.reshape(B, C, H, W)
        w = self.param("weight", nn.initializers.ones, (C,))
        b = self.param("bias", nn.initializers.zeros, (C,))
        return x * w.reshape(1, -1, 1, 1) + b.reshape(1, -1, 1, 1)


def nmf2d(x, bases, train_steps: int = 6, eval_steps: int = 7, eps: float = 1e-6):
    """Multiplicative-update NMF: x [B, C, N] >= 0, bases [B, C, R].

    Returns the rank-R reconstruction bases @ coef^T. Fixed unrolled steps —
    static shapes, jit-friendly.
    """
    # init coef via softmax similarity (inv_t = 100, per the official MD.py)
    coef = jax.nn.softmax(100.0 * jnp.einsum("bcn,bcr->bnr", x, bases), axis=-1)

    def step(bases, coef):
        numerator = jnp.einsum("bcn,bcr->bnr", x, bases)
        denominator = jnp.einsum(
            "bnr,brs->bns", coef, jnp.einsum("bcr,bcs->brs", bases, bases)
        )
        coef = coef * numerator / (denominator + eps)
        numerator = jnp.einsum("bcn,bnr->bcr", x, coef)
        denominator = jnp.einsum(
            "bcr,brs->bcs", bases, jnp.einsum("bnr,bns->brs", coef, coef)
        )
        bases = bases * numerator / (denominator + eps)
        return bases, coef

    for _ in range(eval_steps):
        bases, coef = step(bases, coef)
    # final coef refresh
    numerator = jnp.einsum("bcn,bcr->bnr", x, bases)
    denominator = jnp.einsum(
        "bnr,brs->bns", coef, jnp.einsum("bcr,bcs->brs", bases, bases)
    )
    coef = coef * numerator / (denominator + eps)
    return jnp.einsum("bcr,bnr->bcn", bases, coef)


class Hamburger(nn.Module):
    ham_channels: int = 256
    md_r: int = 16

    @nn.compact
    def __call__(self, x):
        # mmseg ConvModule(norm_cfg=None) keeps the conv bias -> ham_in biased
        enjoy = Conv(self.ham_channels, 1, name="ham_in")(x)
        enjoy = jax.nn.relu(enjoy)
        B, C, H, W = enjoy.shape
        flat = enjoy.reshape(B, C, H * W)
        # deterministic base init (rand_init with fixed fold-in; frozen at eval)
        key = jax.random.PRNGKey(0)
        bases = jax.random.uniform(key, (1, C, self.md_r))
        bases = bases / (jnp.linalg.norm(bases, axis=1, keepdims=True) + 1e-6)
        bases = jnp.broadcast_to(bases, (B, C, self.md_r))
        recon = nmf2d(flat, bases).reshape(B, C, H, W)
        recon = Conv(self.ham_channels, 1, use_bias=False, name="ham_out")(recon)
        recon = GroupNorm32(self.ham_channels, name="ham_out_norm")(recon)
        return jax.nn.relu(x + recon)


class LightHamHead(nn.Module):
    """Concat stages 2-4 -> squeeze -> Hamburger -> align -> classifier."""

    num_classes: int = 19
    channels: int = 256
    ham_channels: int = 256
    md_r: int = 16

    @nn.compact
    def __call__(self, feats):
        target_hw = feats[1].shape[-2:]
        ins = [bilinear_resize(f, target_hw) for f in feats[1:]]
        x = jnp.concatenate(ins, axis=1)
        x = Conv(self.ham_channels, 1, use_bias=False, name="squeeze_conv")(x)
        x = GroupNorm32(self.ham_channels, name="squeeze_norm")(x)
        x = jax.nn.relu(x)
        x = Hamburger(self.ham_channels, self.md_r, name="hamburger")(x)
        x = Conv(self.channels, 1, use_bias=False, name="align_conv")(x)
        x = GroupNorm32(self.channels, name="align_norm")(x)
        x = jax.nn.relu(x)
        return Conv(self.num_classes, 1, name="conv_seg")(x)


class SegNeXt(nn.Module):
    """Whole-image encoder-decoder; logits upsampled to input resolution."""

    variant: str = "small"
    num_classes: int = 19

    @nn.compact
    def __call__(self, x):
        cfg = SEGNEXT_VARIANTS[self.variant]
        H, W = x.shape[-2:]
        feats = MSCAN(
            cfg["embed_dims"], cfg["depths"], cfg["mlp_ratios"], name="backbone"
        )(x)
        logits = LightHamHead(
            self.num_classes, 256, cfg["ham_channels"], name="decode_head"
        )(feats)
        return bilinear_resize(logits, (H, W))


class SegNeXtFaceParser:
    """Host wrapper matching FaceParser's interface; outputs CelebA-taxonomy
    19-class labels (converted with the celebahq converter downstream, per
    ref: face_parsing_demo.py:200-207)."""

    taxonomy = "celeba19"

    def __init__(self, variant="small", variables=None, seed=0, size=512):
        self.model = SegNeXt(variant=variant)
        self.size = size
        if variables is None:
            import jax as _jax

            x0 = jnp.zeros((1, 3, 64, 64), jnp.float32)
            variables = _jax.jit(self.model.init)(_jax.random.PRNGKey(seed), x0)
        self.variables = variables
        self._jit = jax.jit(self._forward)

    def _forward(self, variables, img01):
        return segnext_parse19_device(self.model, variables, img01, self.size)

    def __call__(self, img01):
        return self._jit(self.variables, img01)


def segnext_parse19_device(model, variables, img01, size=512):
    """Device-level SegNeXt parse: [B,3,S,S] in [0,1] -> int32 19-cls labels
    (CelebA taxonomy). Traceable — reused by the fused swap program."""
    x = bilinear_resize(img01, (size, size)) * 255.0
    mean = jnp.asarray(SEGNEXT_MEAN).reshape(1, 3, 1, 1)
    std = jnp.asarray(SEGNEXT_STD).reshape(1, 3, 1, 1)
    x = (x - mean) / std
    logits = model.apply(variables, x)
    return jnp.argmax(logits, axis=1).astype(jnp.int32)
