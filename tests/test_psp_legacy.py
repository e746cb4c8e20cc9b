"""Structural tests for the legacy pSp encoders (unreachable in the
reference's Net3 but part of the §2 component inventory)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from e4s_tpu.models.psp_legacy import (
    BackboneEncoderUsingLastLayerIntoW,
    BackboneEncoderUsingLastLayerIntoWPlus,
    CustomBackboneEncoderUsingLastLayerIntoWPlus,
    GradualStyleEncoder,
)


@pytest.fixture(scope="module")
def img256():
    rng = np.random.RandomState(0)
    return jnp.asarray(rng.rand(1, 3, 256, 256).astype(np.float32) * 2 - 1)


def test_gradual_style_encoder(img256):
    enc = GradualStyleEncoder(n_styles=18)
    variables = enc.init(jax.random.PRNGKey(0), img256)
    out = enc.apply(variables, img256)
    assert out.shape == (1, 18, 512)
    assert np.all(np.isfinite(np.asarray(out)))


def test_backbone_into_w(img256):
    enc = BackboneEncoderUsingLastLayerIntoW()
    variables = enc.init(jax.random.PRNGKey(0), img256)
    out = enc.apply(variables, img256)
    assert out.shape == (1, 512)


def test_backbone_into_wplus(img256):
    enc = BackboneEncoderUsingLastLayerIntoWPlus(n_styles=18)
    variables = enc.init(jax.random.PRNGKey(0), img256)
    out = enc.apply(variables, img256)
    assert out.shape == (1, 18, 512)


def test_custom_backbone_into_wplus(img256):
    enc = CustomBackboneEncoderUsingLastLayerIntoWPlus()
    variables = enc.init(jax.random.PRNGKey(0), img256)
    out, feats = enc.apply(variables, img256)
    assert out.shape == (1, 11, 512)
    # 1x1 structure head on the 256-ch body-20 tap (32^2 at 256^2 input)
    assert feats.shape == (1, 512, 32, 32)
