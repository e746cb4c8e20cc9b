"""LPIPS perceptual metric (v0.1) with AlexNet / VGG16 feature trunks.

Parity targets: src/criteria/lpips/{lpips.py, networks.py, utils.py}.
Feature trunks reproduce torchvision ``alexnet().features`` /
``vgg16().features`` exactly (layer schedule below) so pretrained weights
convert 1:1; the 1x1 "lin" head weights come from the richzhang LPIPS
release via the same converter.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from e4s_tpu.models.encoders import Conv

# torchvision alexnet.features:
#   Conv(3,64,11,s4,p2) ReLU MaxPool(3,2) Conv(64,192,5,p2) ReLU MaxPool(3,2)
#   Conv(192,384,3,p1) ReLU Conv(384,256,3,p1) ReLU Conv(256,256,3,p1) ReLU
#   MaxPool(3,2)
# LPIPS taps the five ReLUs (1-indexed features positions 2,5,8,10,12;
# ref: src/criteria/lpips/networks.py:77-85).
ALEX_CHANNELS = (64, 192, 384, 256, 256)

# torchvision vgg16.features conv schedule; taps at positions 4,9,16,23,30
# (ref: networks.py:88-96).
VGG_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
           512, 512, 512, "M")
VGG_CHANNELS = (64, 128, 256, 512, 512)

# NUMPY on purpose: module-level jnp constants are device-resident (created
# at import on the default backend); used inside a jitted step they get
# embedded as MLIR constants, which forces a trace-time host readback that
# the remote TPU backend rejects (BENCH_r03 INVALID_ARGUMENT). A numpy
# constant lowers through the ndarray handler with no device round-trip.
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32).reshape(1, 3, 1, 1)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32).reshape(1, 3, 1, 1)


def _max_pool(x, k, s):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 1, k, k), (1, 1, s, s), "VALID"
    )


def _normalize_activation(x, eps=1e-10):
    """Unit-normalise along channels. ref: src/criteria/lpips/utils.py"""
    norm = jnp.sqrt(jnp.sum(x**2, axis=1, keepdims=True))
    return x / (norm + eps)


class AlexNetFeatures(nn.Module):
    """ref: src/criteria/lpips/networks.py:77-85"""

    @nn.compact
    def __call__(self, x):
        x = (x - _SHIFT.astype(x.dtype)) / _SCALE.astype(x.dtype)
        taps = []
        x = Conv(64, 11, stride=4, padding=2, name="conv0")(x)
        x = jax.nn.relu(x)
        taps.append(_normalize_activation(x))
        x = _max_pool(x, 3, 2)
        x = Conv(192, 5, padding=2, name="conv1")(x)
        x = jax.nn.relu(x)
        taps.append(_normalize_activation(x))
        x = _max_pool(x, 3, 2)
        x = Conv(384, 3, padding=1, name="conv2")(x)
        x = jax.nn.relu(x)
        taps.append(_normalize_activation(x))
        x = Conv(256, 3, padding=1, name="conv3")(x)
        x = jax.nn.relu(x)
        taps.append(_normalize_activation(x))
        x = Conv(256, 3, padding=1, name="conv4")(x)
        x = jax.nn.relu(x)
        taps.append(_normalize_activation(x))
        return taps


class VGG16Features(nn.Module):
    """ref: src/criteria/lpips/networks.py:88-96. Returns the 5 tapped,
    unit-normalised ReLU activations (one per conv stage end)."""

    taps_after: Sequence[int] = (1, 3, 6, 9, 12)  # conv index whose relu taps

    @nn.compact
    def __call__(self, x):
        x = (x - _SHIFT.astype(x.dtype)) / _SCALE.astype(x.dtype)
        taps = []
        conv_idx = 0
        for entry in VGG_CFG:
            if entry == "M":
                x = _max_pool(x, 2, 2)
            else:
                x = Conv(int(entry), 3, padding=1, name=f"conv{conv_idx}")(x)
                x = jax.nn.relu(x)
                if conv_idx in self.taps_after:
                    taps.append(_normalize_activation(x))
                conv_idx += 1
        return taps


class VGG16Activations(nn.Module):
    """Raw (non-normalised) VGG16 activations at given features positions —
    the Gram style loss trunk. ref: src/criteria/style_loss.py (VGG16_Activations
    with activation list [3, 8, 15, 22] == relu after convs 1, 3, 6, 9)."""

    taps_after: Sequence[int] = (1, 3, 6, 9)

    @nn.compact
    def __call__(self, x):
        taps = []
        conv_idx = 0
        for entry in VGG_CFG:
            if entry == "M":
                x = _max_pool(x, 2, 2)
            else:
                x = Conv(int(entry), 3, padding=1, name=f"conv{conv_idx}")(x)
                x = jax.nn.relu(x)
                if conv_idx in self.taps_after:
                    taps.append(x)
                if conv_idx == max(self.taps_after):
                    return taps
                conv_idx += 1
        return taps


class LPIPS(nn.Module):
    """LPIPS v0.1. forward(x, y) with x,y in [-1,1], NCHW.

    ref: src/criteria/lpips/lpips.py:8-35
    """

    net_type: str = "alex"

    @nn.compact
    def __call__(self, x, y):
        if self.net_type == "alex":
            net = AlexNetFeatures(name="net")
            channels = ALEX_CHANNELS
        elif self.net_type == "vgg":
            net = VGG16Features(name="net")
            channels = VGG_CHANNELS
        else:
            raise NotImplementedError(self.net_type)

        fx = net(x)
        fy = net(y)
        total = 0.0
        for i, (ax, ay) in enumerate(zip(fx, fy)):
            diff = (ax - ay) ** 2
            w = self.param(
                "lin_%d" % i,
                nn.initializers.ones,
                (1, channels[i], 1, 1),
            )
            total = total + jnp.mean(
                jnp.sum(diff * w.astype(diff.dtype), axis=1), axis=(1, 2)
            )
        return jnp.sum(total) / x.shape[0]
