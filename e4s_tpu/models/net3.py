"""Net3 facade: RGI encoder + 12 per-region LocalMLPs + mask-guided Generator.

Parity target: src/models/networks.py:15-183.

Functional-JAX differences from the torch module:
- ``latent_avg`` is an explicit argument (it is checkpoint data, not a
  parameter; ref: scripts/face_swap.py:376 loads it from the ckpt dict).
- freezing policy (train_G / style MLP / layers > K) is enforced by the
  training Coach via an optax gradient mask rather than requires_grad
  (ref: src/models/networks.py:69-82) — see e4s_tpu/training/coach.py.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from e4s_tpu.models.encoders import FSEncoderPSP
from e4s_tpu.models.stylegan2 import Generator
from e4s_tpu.ops.resize import bilinear_resize

DIM_S_CODE = 256 + 512 + 512  # ref: src/models/networks.py:50


class LocalMLP(nn.Module):
    """Texture code -> W^{r+} mapping for one region.

    ref: src/models/networks.py:15-39
    """

    dim_component: int = DIM_S_CODE
    dim_style: int = 512
    num_w_layers: int = 13

    @nn.compact
    def __call__(self, x):
        from e4s_tpu.models.layers import EqualLinear

        out = EqualLinear(self.dim_style, name="fc1")(x)
        out = jax.nn.leaky_relu(out, 0.01)  # torch nn.LeakyReLU default slope
        out = EqualLinear(self.dim_style * self.num_w_layers, name="fc2")(out)
        return out.reshape(-1, self.num_w_layers, self.dim_style)


class Net3(nn.Module):
    """ref: src/models/networks.py:41-183"""

    num_seg_cls: int = 12
    out_size: int = 1024
    remaining_layer_idx: int = 13  # K
    split_layer_idx: int = 5
    n_styles: int = 18
    start_from_latent_avg: bool = True
    learn_in_w: bool = False
    fast_masked: bool = True
    # NHWC synthesis internals (checkpoint- and API-compatible either way)
    channels_last: bool = False
    # Encoder input resolution. The reference fixes 256 (networks.py:87);
    # overridable so tiny-shape validation runs (e.g. the driver's CPU
    # multichip dryrun) don't compile a 256^2 trunk for a 32^2 model.
    encoder_size: int = 256
    # one trunk block per stage (same widths/strides/code dims) — used only
    # by compile-budgeted validation runs, never training or parity
    encoder_slim: bool = False
    # validation-only generator channel narrowing (see generator_channels)
    ch_div: int = 1

    def setup(self):
        self.encoder = FSEncoderPSP(
            self.num_seg_cls, channels_last=self.channels_last,
            slim=self.encoder_slim, name="encoder",
        )
        num_w = self.remaining_layer_idx if self.remaining_layer_idx != 17 else 18
        self.MLPs = [
            LocalMLP(DIM_S_CODE, 512, num_w, name=f"MLPs_{i}")
            for i in range(self.num_seg_cls)
        ]
        self.G = Generator(
            size=self.out_size,
            style_dim=512,
            n_mlp=8,
            split_layer_idx=self.split_layer_idx,
            remaining_layer_idx=self.remaining_layer_idx,
            fast_masked=self.fast_masked,
            channels_last=self.channels_last,
            ch_div=self.ch_div,
            name="G",
        )

    # ---- public API (mirrors the torch Net3 methods) ----

    def __call__(
        self,
        img,
        mask,
        latent_avg: Optional[jnp.ndarray] = None,
        randomize_noise: bool = True,
        noise=None,
        return_latents: bool = False,
    ):
        """Full forward: encode -> MLPs -> +latent_avg -> G.

        img: [B,3,S,S] in [-1,1]; mask: [B,R,S,S] one-hot.
        ref: src/models/networks.py:85-119
        """
        codes_vector, structure_feats = self._encode(img, mask)
        style_codes = self._codes_to_styles(codes_vector, latent_avg)
        images, result_latent, structure_feats_gt = self.G(
            [style_codes],
            structure_feats,
            mask,
            input_is_latent=True,
            randomize_noise=randomize_noise,
            noise=noise,
            return_latents=return_latents,
            use_structure_code=False,
        )
        if return_latents:
            return images, structure_feats_gt, result_latent
        return images, structure_feats_gt

    def get_style_vectors(self, img, mask):
        """[B,3,S,S] -> ([B,R,1280], zeros). ref: networks.py:121-133"""
        return self._encode(img, mask)

    def _encode(self, img, mask):
        """Resize to 256² and run the RGI encoder (NHWC trunk when
        ``channels_last``; public I/O stays NCHW either way)."""
        img256 = bilinear_resize(img, (self.encoder_size, self.encoder_size))
        if self.channels_last:
            img256 = jnp.transpose(img256, (0, 2, 3, 1))
        return self.encoder(img256, mask)

    def cal_style_codes(self, style_vectors, latent_avg=None):
        """[B,R,1280] -> W^{r+} [B,R,18,512]. ref: networks.py:135-158"""
        return self._codes_to_styles(style_vectors, latent_avg)

    def gen_img(
        self,
        struc_codes,
        style_codes,
        mask,
        randomize_noise: bool = True,
        noise=None,
        return_latents: bool = False,
    ):
        """ref: networks.py:160-182"""
        images, result_latent, structure_feats = self.G(
            [style_codes],
            struc_codes,
            mask,
            input_is_latent=True,
            randomize_noise=randomize_noise,
            noise=noise,
            return_latents=return_latents,
            use_structure_code=False,
        )
        if return_latents:
            return images, result_latent, structure_feats
        return images, -1, structure_feats

    # ---- internals ----

    def _codes_to_styles(self, codes_vector, latent_avg):
        B, R = codes_vector.shape[0], codes_vector.shape[1]
        K = self.remaining_layer_idx
        codes = jnp.stack(
            [
                self.MLPs[i](codes_vector[:, i, :])
                for i in range(self.num_seg_cls)
            ],
            axis=1,
        )  # [B, R, K, 512]

        if self.start_from_latent_avg:
            assert latent_avg is not None, (
                "start_from_latent_avg=True requires the checkpoint latent_avg"
            )
            la = latent_avg.astype(codes.dtype)  # [18, 512]
            if K != 17:
                codes = codes + la[None, None, :K, :]
                remaining = jnp.broadcast_to(
                    la[None, None, K:, :], (B, R, self.n_styles - K, 512)
                )
                codes = jnp.concatenate([codes, remaining], axis=2)
            else:
                codes = codes + la[None, None, :, :]
        return codes
