"""Fused bias + LeakyReLU + gain activation.

The reference ships a CUDA elementwise kernel for this
(ref: src/models/stylegan2/op/fused_act.py:72-85, fused_bias_act_kernel.cu).
On TPU a separate kernel is an anti-pattern: XLA fuses the bias-add, the
leaky-relu select and the gain into the producing matmul/conv epilogue
automatically, so a plain jnp expression *is* the fused kernel.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

SQRT2 = math.sqrt(2.0)


def fused_leaky_relu(
    x: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    negative_slope: float = 0.2,
    scale: float = SQRT2,
    channels_last: bool = False,
) -> jnp.ndarray:
    """out = scale * leaky_relu(x + bias).

    ``bias`` has shape [C] and is broadcast over the channel axis: axis 1 for
    rank >= 3 inputs (NCHW feature maps), last axis for rank <= 2 (linear
    activations) — matching the reference's rearrange
    (ref: src/models/stylegan2/op/fused_act.py:75-84). With ``channels_last``
    (NHWC feature maps) the bias broadcasts over the last axis.
    """
    if bias is not None:
        if x.ndim >= 3 and not channels_last:
            shape = [1, -1] + [1] * (x.ndim - 2)
            x = x + bias.reshape(shape)
        else:
            x = x + bias
    return jax.nn.leaky_relu(x, negative_slope) * scale


def scaled_leaky_relu(x: jnp.ndarray, negative_slope: float = 0.2) -> jnp.ndarray:
    """LeakyReLU followed by sqrt(2) gain (no bias).

    ref: src/models/stylegan2/model.py:172-181
    """
    return jax.nn.leaky_relu(x, negative_slope) * SQRT2
