"""ArcFace identity loss. Parity target: src/criteria/id_loss.py:6-57."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from e4s_tpu.models.encoders import IRSE50Backbone
from e4s_tpu.ops.resize import adaptive_avg_pool2d


class IDLoss(nn.Module):
    """loss = sum over feature scales of mean(1 - <f(y_hat), f(y)>).

    The IR-SE50 trunk is frozen; its weights convert from
    ``model_ir_se50.pth`` (ref: src/options/train_options.py:69).
    """

    multiscale: bool = True

    def setup(self):
        self.facenet = IRSE50Backbone(name="facenet")

    def extract_feats(self, x):
        """resize 256 -> crop rows 35:223 cols 32:220 -> pool 112.

        ref: src/criteria/id_loss.py:24-29
        """
        if x.shape[2] != 256:
            x = adaptive_avg_pool2d(x, (256, 256))
        x = x[:, :, 35:223, 32:220]
        x = adaptive_avg_pool2d(x, (112, 112))
        return self.facenet(x, multi_scale=self.multiscale)

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
