"""SegNeXt parser structural tests (small shapes)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from e4s_tpu.models.segnext import (
    MSCAN,
    SegNeXt,
    SEGNEXT_VARIANTS,
    nmf2d,
)


def test_mscan_feature_pyramid():
    cfg = SEGNEXT_VARIANTS["tiny"]
    model = MSCAN(cfg["embed_dims"], cfg["depths"], cfg["mlp_ratios"])
    x = jnp.zeros((1, 3, 64, 64))
    variables = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(variables, x)
    assert [f.shape for f in feats] == [
        (1, 32, 16, 16), (1, 64, 8, 8), (1, 160, 4, 4), (1, 256, 2, 2)
    ]


def test_segnext_logits_shape():
    model = SegNeXt(variant="tiny")
    x = jnp.zeros((1, 3, 64, 64))
    variables = model.init(jax.random.PRNGKey(0), x)
    logits = model.apply(variables, x)
    assert logits.shape == (1, 19, 64, 64)


def test_nmf_reconstruction_improves():
    """NMF reconstruction of a non-negative rank-2 matrix should be close."""
    rng = np.random.RandomState(0)
    U = np.abs(rng.rand(1, 16, 2))
    V = np.abs(rng.rand(1, 2, 50))
    x = jnp.asarray((U @ V).astype(np.float32))
    bases = jnp.asarray(np.abs(rng.rand(1, 16, 4)).astype(np.float32))
    recon = np.asarray(nmf2d(x, bases))
    rel_err = np.linalg.norm(recon - np.asarray(x)) / np.linalg.norm(np.asarray(x))
    assert rel_err < 0.15
