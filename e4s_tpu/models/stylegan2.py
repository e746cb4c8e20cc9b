"""StyleGAN2 generator (E4S mask-guided variant) + discriminator, in JAX.

Parity target: src/models/stylegan2/model.py:184-799. The E4S twist — regional
style injection for layers < K under a one-hot segmentation mask
(ref: model.py:386-400, 426-439) — is implemented with the exact factorised
masked modulated conv from ``e4s_tpu.ops.modconv`` (1x conv FLOPs instead of
the reference's 12-conv region loop; see that module's docstring for the
math).

Generator layer schedule for out_size=1024, K=remaining_layer_idx=13
(ref: model.py:494-548, 630-659):

  conv1 (4^2)        masked     style idx 0
  to_rgb1 (4^2)      masked     style idx 1
  scale s=3..10 (8^2..1024^2), layer indices i = 2s-5, 2s-4:
    convs masked iff s <= 2 + K//2 (i.e. i < K)
    to_rgbs masked iff s < 2 + K//2 or K == 17
  layers with i >= K consume the shared style latent[:, 0, i].
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from e4s_tpu.models.layers import (
    ConvLayer,
    EqualLinear,
    FusedLeakyReLU,
    pixel_norm,
)
from e4s_tpu.ops.modconv import (
    depth_to_space2,
    masked_modulated_conv2d,
    masked_modulated_conv2d_naive,
    masked_modulated_conv2d_nhwc,
    masked_torgb,
    masked_torgb_nhwc,
    modulated_conv2d,
    modulated_conv2d_nhwc,
    modulated_conv2d_nhwc_packed,
    modulated_conv2d_nhwc_up_packed,
    packed_tail_min_res,
    packed_tail_wanted,
    space_to_depth2,
    torgb_nhwc_packed,
)
from e4s_tpu.ops.upfirdn2d import upsample2, upsample2_packed

CHANNELS = {
    4: 512, 8: 512, 16: 512, 32: 512,
    64: 512, 128: 256, 256: 128, 512: 64, 1024: 32,
}
# channel_multiplier=2 applied (ref: model.py:481-491)


def generator_channels(channel_multiplier: int = 2, ch_div: int = 1):
    """``ch_div`` uniformly narrows every stage (min 8 ch). It exists ONLY
    for compile/runtime-budgeted validation runs (the driver's virtual-CPU
    multichip dryrun): narrower convs change neither the layer schedule nor
    the sharding/collective pattern of a training step, just the FLOPs a
    1-core host must chew through. Never used for training or parity."""
    base = {
        4: 512, 8: 512, 16: 512, 32: 512,
        64: 256 * channel_multiplier,
        128: 128 * channel_multiplier,
        256: 64 * channel_multiplier,
        512: 32 * channel_multiplier,
        1024: 16 * channel_multiplier,
    }
    if ch_div == 1:
        return base
    return {k: max(8, v // ch_div) for k, v in base.items()}


class ModulatedConv2d(nn.Module):
    """Weight-modulated conv, fused-path semantics + masked regional variant.

    ref: src/models/stylegan2/model.py:184-320
    """

    in_channel: int
    out_channel: int
    kernel_size: int
    style_dim: int
    demodulate: bool = True
    upsample: bool = False
    downsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    fast_masked: bool = True
    channels_last: bool = False

    def setup(self):
        self.weight = self.param(
            "weight",
            nn.initializers.normal(stddev=1.0),
            (self.out_channel, self.in_channel, self.kernel_size, self.kernel_size),
        )
        self.modulation = EqualLinear(
            self.in_channel, bias_init=1.0, name="modulation"
        )
        self.scale = 1.0 / math.sqrt(self.in_channel * self.kernel_size**2)

    def __call__(self, x, style, mask=None, packed_in=False, packed_out=False):
        """style: [B, style_dim] (plain) or [B, R, style_dim] with one-hot
        ``mask`` [B, R, Hm, Wm] for regional injection. ``x`` is NCHW, or
        NHWC when ``channels_last`` (weights stay OIHW either way).

        ``packed_in``/``packed_out`` select the exact space-to-depth
        (packed) domain for the unmasked NHWC tail (see
        e4s_tpu.ops.modconv packed-domain section): ``packed_out`` on an
        upsampling conv takes unpacked input and emits packed output;
        ``packed_in`` runs a stride-1 conv wholly in the packed domain."""
        w_scaled = self.weight * self.scale
        s = self.modulation(style)  # [..., Ci]
        if packed_in or packed_out:
            assert mask is None and self.channels_last and not self.downsample
            if packed_out:
                assert self.upsample and not packed_in
                return modulated_conv2d_nhwc_up_packed(
                    x, w_scaled, s, demodulate=self.demodulate,
                    blur_kernel=tuple(self.blur_kernel),
                )
            assert not self.upsample
            if self.kernel_size == 1 and not self.demodulate:
                return torgb_nhwc_packed(x, w_scaled, s)
            return modulated_conv2d_nhwc_packed(
                x, w_scaled, s, demodulate=self.demodulate
            )
        if mask is None:
            fn = modulated_conv2d_nhwc if self.channels_last else modulated_conv2d
            return fn(
                x, w_scaled, s,
                demodulate=self.demodulate,
                up=self.upsample, down=self.downsample,
                blur_kernel=tuple(self.blur_kernel),
            )
        assert not self.downsample
        if self.kernel_size == 1 and not self.demodulate and not self.upsample:
            fn = masked_torgb_nhwc if self.channels_last else masked_torgb
            return fn(x, w_scaled, s, mask)
        if self.channels_last:
            if not self.fast_masked:
                # naive oracle is NCHW-only; bounce layouts (test path)
                out = masked_modulated_conv2d_naive(
                    jnp.transpose(x, (0, 3, 1, 2)), w_scaled, s, mask,
                    demodulate=self.demodulate, up=self.upsample,
                    blur_kernel=tuple(self.blur_kernel),
                )
                return jnp.transpose(out, (0, 2, 3, 1))
            fn = masked_modulated_conv2d_nhwc
        else:
            fn = (
                masked_modulated_conv2d if self.fast_masked
                else masked_modulated_conv2d_naive
            )
        return fn(
            x, w_scaled, s, mask,
            demodulate=self.demodulate, up=self.upsample,
            blur_kernel=tuple(self.blur_kernel),
        )


class NoiseInjection(nn.Module):
    """ref: src/models/stylegan2/model.py:323-335"""

    channels_last: bool = False

    @nn.compact
    def __call__(self, x, noise=None, deterministic=False, packed=False):
        """``packed``: x is space-to-depth packed [B,H,W,4C]; noise keeps the
        public unpacked contract and is packed here (phase values repeated
        C times along the phase-major channel axis), so results equal the
        unpacked path exactly — including the random draw, which uses the
        unpacked [B,2H,2W,1] shape."""
        weight = self.param("weight", nn.initializers.zeros, (1,))
        if noise is None:
            if deterministic:
                return x
            key = self.make_rng("noise")
            if packed:
                B, H, W, _ = x.shape
                noise = jax.random.normal(key, (B, 2 * H, 2 * W, 1), dtype=x.dtype)
            elif self.channels_last:
                B, H, W, _ = x.shape
                noise = jax.random.normal(key, (B, H, W, 1), dtype=x.dtype)
            else:
                B, _, H, W = x.shape
                noise = jax.random.normal(key, (B, 1, H, W), dtype=x.dtype)
            if packed:
                noise = space_to_depth2(noise)  # [B,H,W,4]
                noise = jnp.repeat(noise, x.shape[-1] // 4, axis=-1)
        elif (packed or self.channels_last) and noise.ndim == 4:
            # caller-supplied noise keeps the public NCHW contract: [B,1,H,W]
            # (registered buffers) or full-channel [B,C,H,W] (the edit
            # pipeline's fixed noise, ref: scripts/face_edit.py:49-51)
            if noise.shape[1] == 1:
                # singleton channel makes the relayout a pure reshape
                noise = noise.reshape(noise.shape[0], *noise.shape[2:], 1)
            else:
                noise = jnp.transpose(noise, (0, 2, 3, 1))
            if packed:
                noise = space_to_depth2(noise)  # [B,H,W,4] or [B,H,W,4C]
                if noise.shape[-1] != x.shape[-1]:
                    noise = jnp.repeat(noise, x.shape[-1] // 4, axis=-1)
        return x + weight.astype(x.dtype) * noise.astype(x.dtype)


class StyledConv(nn.Module):
    """ModulatedConv + noise + fused bias/act, with mask-guided option.

    ref: src/models/stylegan2/model.py:351-406
    """

    in_channel: int
    out_channel: int
    kernel_size: int
    style_dim: int
    upsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    demodulate: bool = True
    mask_op: bool = False
    fast_masked: bool = True
    channels_last: bool = False

    def setup(self):
        self.conv = ModulatedConv2d(
            self.in_channel, self.out_channel, self.kernel_size, self.style_dim,
            demodulate=self.demodulate, upsample=self.upsample,
            blur_kernel=self.blur_kernel, fast_masked=self.fast_masked,
            channels_last=self.channels_last, name="conv",
        )
        self.noise = NoiseInjection(channels_last=self.channels_last, name="noise")
        self.activate = FusedLeakyReLU(
            self.out_channel, channels_last=self.channels_last, name="activate"
        )

    def __call__(
        self, x, style, mask, noise=None, deterministic=False,
        packed_in=False, packed_out=False,
    ):
        packed = packed_in or packed_out
        out = self.conv(
            x, style, mask=None if packed else (mask if self.mask_op else None),
            packed_in=packed_in, packed_out=packed_out,
        )
        out = self.noise(
            out, noise=noise, deterministic=deterministic, packed=packed
        )
        return self.activate(out, packed=packed)


class ToRGB(nn.Module):
    """1x1 modulated conv to RGB with skip upsampling.

    ref: src/models/stylegan2/model.py:409-448
    """

    in_channel: int
    style_dim: int
    upsample: bool = True
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    mask_op: bool = False
    fast_masked: bool = True
    channels_last: bool = False

    def setup(self):
        self.conv = ModulatedConv2d(
            self.in_channel, 3, 1, self.style_dim, demodulate=False,
            fast_masked=self.fast_masked, channels_last=self.channels_last,
            name="conv",
        )
        self.bias = self.param("bias", nn.initializers.zeros, (1, 3, 1, 1))

    def __call__(self, x, style, mask, skip=None, packed=False):
        """``packed``: x is space-to-depth packed [B,H,W,4Ci]; the returned
        skip is packed RGB [B,H,W,12] (phase-major). ``skip`` arrives
        UNPACKED at the pre-upsample resolution — its 2x FIR upsample is
        emitted directly in packed form (exact polyphase)."""
        if packed:
            out = self.conv(x, style, mask=None, packed_in=True)
            out = out + jnp.tile(
                self.bias.reshape(3), 4
            ).reshape(1, 1, 1, 12).astype(out.dtype)
            if skip is not None:
                out = out + upsample2_packed(
                    skip, tuple(self.blur_kernel)
                ).astype(out.dtype)
            return out
        out = self.conv(x, style, mask=mask if self.mask_op else None)
        bias = (
            self.bias.reshape(1, 1, 1, 3) if self.channels_last else self.bias
        )
        out = out + bias.astype(out.dtype)
        if skip is not None:
            skip = upsample2(
                skip, tuple(self.blur_kernel), channels_last=self.channels_last
            )
            out = out + skip
        return out


class Generator(nn.Module):
    """Mask-guided StyleGAN2 synthesis network.

    ref: src/models/stylegan2/model.py:451-667
    """

    size: int = 1024
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    lr_mlp: float = 0.01
    split_layer_idx: int = 5
    remaining_layer_idx: int = 13
    fast_masked: bool = True
    # channels-last (NHWC) synthesis: the TPU-native layout. Params and the
    # public interface (images, structure feats, noise buffers) stay in torch
    # NCHW/OIHW layouts; only the internal activations are channels-last, so
    # checkpoints and callers are layout-agnostic.
    channels_last: bool = False
    # validation-only channel narrowing (see generator_channels)
    ch_div: int = 1

    def setup(self):
        channels = generator_channels(self.channel_multiplier, self.ch_div)
        self.log_size = int(math.log2(self.size))
        self.num_layers = (self.log_size - 2) * 2 + 1
        self.n_latent = self.log_size * 2 - 2

        self.style = [
            EqualLinear(
                self.style_dim, lr_mul=self.lr_mlp, activation="fused_lrelu",
                name=f"style_{i + 1}",
            )
            for i in range(self.n_mlp)
        ]

        self.input = self.param(
            "input", nn.initializers.normal(stddev=1.0),
            (1, channels[4], 4, 4),
        )
        self.conv1 = StyledConv(
            channels[4], channels[4], 3, self.style_dim,
            blur_kernel=self.blur_kernel, mask_op=True,
            fast_masked=self.fast_masked, channels_last=self.channels_last,
            name="conv1",
        )
        self.to_rgb1 = ToRGB(
            channels[4], self.style_dim, upsample=False, mask_op=True,
            fast_masked=self.fast_masked, channels_last=self.channels_last,
            name="to_rgb1",
        )

        convs = []
        to_rgbs = []
        in_channel = channels[4]
        for s in range(3, self.log_size + 1):
            out_channel = channels[2**s]
            conv_masked = not (s > 2 + self.remaining_layer_idx // 2)
            rgb_masked = not (
                self.remaining_layer_idx != 17
                and s >= 2 + self.remaining_layer_idx // 2
            )
            convs.append(
                StyledConv(
                    in_channel, out_channel, 3, self.style_dim, upsample=True,
                    blur_kernel=self.blur_kernel, mask_op=conv_masked,
                    fast_masked=self.fast_masked,
                    channels_last=self.channels_last,
                    name=f"convs_{2 * (s - 3)}",
                )
            )
            convs.append(
                StyledConv(
                    out_channel, out_channel, 3, self.style_dim,
                    blur_kernel=self.blur_kernel, mask_op=conv_masked,
                    fast_masked=self.fast_masked,
                    channels_last=self.channels_last,
                    name=f"convs_{2 * (s - 3) + 1}",
                )
            )
            to_rgbs.append(
                ToRGB(
                    out_channel, self.style_dim, mask_op=rgb_masked,
                    fast_masked=self.fast_masked,
                    channels_last=self.channels_last,
                    name=f"to_rgbs_{s - 3}",
                )
            )
            in_channel = out_channel
        self.convs = convs
        self.to_rgbs = to_rgbs

        # Registered per-layer noise buffers (ref: model.py:512-516) used when
        # randomize_noise=False.
        self._noises = [
            self.variable(
                "noises", f"noise_{i}",
                lambda shape: jax.random.normal(jax.random.PRNGKey(i), shape),
                (1, 1, 2 ** ((i + 5) // 2), 2 ** ((i + 5) // 2)),
            )
            for i in range(self.num_layers)
        ]

    def run_style_mlp(self, z):
        """8-layer z -> w mapping. ref: model.py:470-479, 573-574"""
        out = pixel_norm(z)
        for layer in self.style:
            out = layer(out)
        return out

    def mean_latent(self, rng, n_latent: int):
        """ref: model.py:565-571"""
        z = jax.random.normal(rng, (n_latent, self.style_dim))
        return jnp.mean(self.run_style_mlp(z), axis=0, keepdims=True)

    def __call__(
        self,
        styles,
        structure_feats,
        mask,
        return_latents: bool = False,
        inject_index: Optional[int] = None,
        truncation: float = 1.0,
        truncation_latent: Optional[jnp.ndarray] = None,
        input_is_latent: bool = False,
        noise: Optional[Sequence[Optional[jnp.ndarray]]] = None,
        randomize_noise: bool = True,
        use_structure_code: bool = False,
    ):
        """ref: src/models/stylegan2/model.py:576-667.

        For the E4S path ``styles`` is a one-element list holding the W^{r+}
        latent [B, R, n_latent, 512]; masked layers consume latent[:, :, i]
        and shared layers latent[:, 0, i].
        """
        if not input_is_latent:
            styles = [self.run_style_mlp(s) for s in styles]
        else:
            # Trace the style MLP so its params always exist (XLA dead-code
            # eliminates this under jit; needed for z-space use after an
            # init that only exercised the latent path).
            _ = self.run_style_mlp(jnp.zeros((1, self.style_dim)))

        if noise is None:
            if randomize_noise:
                noise = [None] * self.num_layers
            else:
                noise = [v.value for v in self._noises]

        if truncation < 1:
            styles = [
                truncation_latent + truncation * (s - truncation_latent)
                for s in styles
            ]

        if len(styles) < 2:
            if styles[0].ndim < 4:
                latent = jnp.repeat(styles[0][:, None], self.n_latent, axis=1)
                # expand a regional axis of size 1 for uniform indexing
                latent = latent[:, None]
            else:
                latent = styles[0]
        else:
            if inject_index is None:
                inject_index = self.n_latent // 2
            latent = jnp.concatenate(
                [
                    jnp.repeat(styles[0][:, None], inject_index, axis=1),
                    jnp.repeat(
                        styles[1][:, None], self.n_latent - inject_index, axis=1
                    ),
                ],
                axis=1,
            )[:, None]

        deterministic = not randomize_noise and noise is None

        B = latent.shape[0]
        inp = self.input.astype(latent.dtype)
        if self.channels_last:
            inp = jnp.transpose(inp, (0, 2, 3, 1))
        out = jnp.broadcast_to(inp, (B,) + inp.shape[1:])
        out = self.conv1(out, latent[:, :, 0], mask, noise=noise[0])
        skip = self.to_rgb1(out, latent[:, :, 1], mask)

        intermediate_feats = None
        i = 1
        for idx in range(len(self.to_rgbs)):
            conv1 = self.convs[2 * idx]
            conv2 = self.convs[2 * idx + 1]
            noise1 = noise[1 + 2 * idx]
            noise2 = noise[2 + 2 * idx]
            to_rgb = self.to_rgbs[idx]

            if i < self.remaining_layer_idx:
                out = conv1(out, latent[:, :, i], mask, noise=noise1)
                if i + 2 == self.split_layer_idx:
                    if use_structure_code:
                        # structure codes arrive NCHW (public contract)
                        out = (
                            jnp.transpose(structure_feats, (0, 2, 3, 1))
                            if self.channels_last else structure_feats
                        )
                    intermediate_feats = out
                out = conv2(out, latent[:, :, i + 1], mask, noise=noise2)
                if (
                    self.remaining_layer_idx == 17
                    or i + 2 != self.remaining_layer_idx
                ):
                    skip = to_rgb(out, latent[:, :, i + 2], mask, skip)
                else:
                    skip = to_rgb(out, latent[:, 0, i + 2], mask, skip)
            else:
                # Packed (space-to-depth) tail: unmasked octaves at
                # >= E4S_TPU_PACKED_MIN_RES run at half spatial resolution
                # with 4x channels (exact relabeling — see e4s_tpu.ops.modconv
                # packed-domain section), sidestepping XLA:TPU's lane padding
                # of the small-channel high-res layers (measured ~2.3x on the
                # 32-channel 1024^2 convs; default threshold 1024 — the
                # 64-channel 512^2 octave measured a wash).
                pk = (
                    self.channels_last
                    and not (conv1.mask_op or conv2.mask_op or to_rgb.mask_op)
                    and 2 ** (idx + 3) >= packed_tail_min_res()
                    and packed_tail_wanted()
                )
                outp = conv1(
                    out, latent[:, 0, i], mask, noise=noise1, packed_out=pk
                )
                outp = conv2(
                    outp, latent[:, 0, i + 1], mask, noise=noise2, packed_in=pk
                )
                skip = to_rgb(outp, latent[:, 0, i + 2], mask, skip, packed=pk)
                if pk:
                    skip = depth_to_space2(skip)
                    # unpack the features only if another octave consumes them
                    out = (
                        depth_to_space2(outp)
                        if idx < len(self.to_rgbs) - 1 else outp
                    )
                else:
                    out = outp
            i += 2

        image = skip
        if self.channels_last:
            # public contract stays NCHW
            image = jnp.transpose(image, (0, 3, 1, 2))
            if intermediate_feats is not None:
                intermediate_feats = jnp.transpose(
                    intermediate_feats, (0, 3, 1, 2)
                )
        if return_latents:
            return image, latent, intermediate_feats
        return image, None, intermediate_feats


class ResBlock(nn.Module):
    """ref: src/models/stylegan2/model.py:719-737"""

    in_channel: int
    out_channel: int
    blur_kernel: Sequence[int] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x, packed_in: bool = False):
        """``packed_in``: x is space-to-depth packed NHWC [B,H,W,4Ci] (see
        e4s_tpu.ops.packed); the block then runs entirely in the packed
        domain — the downsample convs consume packed input directly (blur
        folded into the stride-2 composite) — and returns UNPACKED NHWC
        [B,H,W,Co]. Exact; params identical either way."""
        out = ConvLayer(self.in_channel, 3, name="conv1")(x, packed_in=packed_in)
        out = ConvLayer(self.out_channel, 3, downsample=True, name="conv2")(
            out, packed_in=packed_in
        )
        skip = ConvLayer(
            self.out_channel, 1, downsample=True, activate=False, use_bias=False,
            name="skip",
        )(x, packed_in=packed_in)
        return (out + skip) / math.sqrt(2)


class Discriminator(nn.Module):
    """StyleGAN2 discriminator with minibatch stddev.

    ref: src/models/stylegan2/model.py:740-799
    """

    size: int = 1024
    channel_multiplier: int = 2
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    stddev_group: int = 4
    stddev_feat: int = 1
    # validation-only channel narrowing (see generator_channels)
    ch_div: int = 1

    @nn.compact
    def __call__(self, x):
        from e4s_tpu.ops.packed import (
            packed_d_max_ch,
            packed_d_wanted,
            space_to_depth2,
        )

        channels = generator_channels(self.channel_multiplier, self.ch_div)
        log_size = int(math.log2(self.size))
        in_channel = channels[self.size]

        # Packed (space-to-depth) head: blocks whose input channel count is
        # below the 128-lane width run in the packed domain (half spatial,
        # 4x channels — exact relabeling, see e4s_tpu.ops.packed), dodging
        # XLA:TPU's lane padding of the 32/64-channel 1024^2/512^2 layers.
        pk_ch = packed_d_max_ch() if packed_d_wanted() else 0
        pk = in_channel < pk_ch and self.size >= 8
        if pk:
            xin = space_to_depth2(jnp.transpose(x, (0, 2, 3, 1)))
        else:
            xin = x
        out = ConvLayer(in_channel, 1, name="convs_0")(xin, packed_in=pk)
        for k, i in enumerate(range(log_size, 2, -1)):
            out_channel = channels[2 ** (i - 1)]
            out = ResBlock(in_channel, out_channel, name=f"convs_{k + 1}")(
                out, packed_in=pk
            )
            if pk:
                # ResBlock returned unpacked NHWC; re-pack for the next
                # block while it still qualifies, else back to NCHW.
                pk = i > 3 and out_channel < pk_ch and 2 ** (i - 1) >= 8
                out = (
                    space_to_depth2(out)
                    if pk
                    else jnp.transpose(out, (0, 3, 1, 2))
                )
            in_channel = out_channel

        B, C, H, W = out.shape
        group = min(B, self.stddev_group)
        stddev = out.reshape(
            group, -1, self.stddev_feat, C // self.stddev_feat, H, W
        )
        stddev = jnp.sqrt(jnp.var(stddev, axis=0) + 1e-8)
        # [B//g, feat, C//feat, H, W] -> mean over (C//feat, H, W)
        stddev = jnp.mean(stddev, axis=(2, 3, 4), keepdims=True)
        stddev = jnp.squeeze(stddev, axis=2)  # [B//g, feat(=1), 1, 1]
        stddev = jnp.tile(stddev, (group, 1, H, W))
        out = jnp.concatenate([out, stddev], axis=1)

        out = ConvLayer(channels[4], 3, name="final_conv")(out)
        out = out.reshape(B, -1)
        out = EqualLinear(
            channels[4], activation="fused_lrelu", name="final_linear_0"
        )(out)
        return EqualLinear(1, name="final_linear_1")(out)
