"""Gram-matrix style loss (off by default; used for hair region).

Parity target: src/criteria/style_loss.py:102-221 with
VGG16 activation list [3, 8, 15, 22] (ref: src/training/coach.py:156-158),
optional ImageNet re-normalisation of [-1,1] inputs, optional region masks.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from e4s_tpu.models.lpips_nets import VGG16Activations
from e4s_tpu.ops.resize import bilinear_resize

VGG_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
VGG_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def gram_matrix(x):
    """ref: style_loss.py:211-219"""
    N, C, H, W = x.shape
    flat = x.reshape(N * C, H * W)
    return (flat @ flat.T) / (N * H * W * C)


class StyleLoss(nn.Module):
    normalize: bool = True
    distance: str = "l2"

    def setup(self):
        self.vgg16_act = VGG16Activations(name="vgg16_act")

    def __call__(self, x, x_hat, mask_x=None, mask_x_hat=None):
        x = bilinear_resize(x, (256, 256))
        x_hat = bilinear_resize(x_hat, (256, 256))

        if self.normalize:
            x = self._normalize_img(x)
            x_hat = self._normalize_img(x_hat)

        if mask_x is not None:
            H, W = x.shape[2], x.shape[3]
            x = x * bilinear_resize(mask_x, (H, W))
            x_hat = x_hat * bilinear_resize(mask_x_hat, (H, W))

        act_x = self.vgg16_act(x)
        act_x_hat = self.vgg16_act(x_hat)

        loss = 0.0
        for fx, fxh in zip(act_x, act_x_hat):
            gx = gram_matrix(fx)
            gxh = gram_matrix(fxh)
            if self.distance == "l2":
                loss = loss + jnp.mean((gx - gxh) ** 2)
            else:
                loss = loss + jnp.mean(jnp.abs(gx - gxh))
        return loss / len(act_x)

    def _normalize_img(self, x):
        x = (x + 1) / 2
        mean = jnp.asarray(VGG_MEAN).reshape(1, 3, 1, 1)
        std = jnp.asarray(VGG_STD).reshape(1, 3, 1, 1)
        return (x - mean) / std
