"""Face-parsing feature loss.

Parity target: src/criteria/face_parsing/face_parsing_loss.py:20-78 — cosine
similarity over the 5 l2-normalised multi-scale U-Net encoder features at
512^2 input.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from e4s_tpu.models.unet import ParsingUNet
from e4s_tpu.ops.resize import adaptive_avg_pool2d


class FaceParsingLoss(nn.Module):
    def setup(self):
        self.G = ParsingUNet(name="G")

    def extract_feats(self, x):
        if x.shape[2] != 512:
            x = adaptive_avg_pool2d(x, (512, 512))
        return self.G(x, extract_feats_only=True)

    def inference(self, x):
        """Full 19-class logits at 512^2 (ref: face_parsing_loss.py:37-45)."""
        if x.shape[2] != 512:
            x = adaptive_avg_pool2d(x, (512, 512))
        return self.G(x)

    def __call__(self, y_hat, y):
        y_feats = [jax.lax.stop_gradient(f) for f in self.extract_feats(y)]
        y_hat_feats = self.extract_feats(y_hat)
        loss = 0.0
        sim_improvement = 0.0
        for fh, f in zip(y_hat_feats, y_feats):
            sim_target = jnp.sum(fh * f, axis=1)
            sim_views = jnp.sum(f * f, axis=1)
            loss = loss + jnp.mean(1.0 - sim_target)
            sim_improvement = sim_improvement + jnp.mean(sim_target - sim_views)
        return loss, sim_improvement
