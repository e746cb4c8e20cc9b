"""NHWC (channels-last) RGI-encoder trunk must reproduce the NCHW path
bit-for-bit from the SAME variables (weights stay torch OIHW either way).

ref: src/models/encoders/psp_encoders.py:238-308 (layout is an internal
detail; the public API stays NCHW).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e4s_tpu.models.encoders import FSEncoderPSP
from e4s_tpu.ops.masked_pool import masked_region_mean

S, R = 64, 12


@pytest.fixture(scope="module")
def enc_setup():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 3, S, S).astype(np.float32))
    lab = rng.randint(0, R, size=(2, S, S))
    seg = jnp.asarray(
        (lab[:, None] == np.arange(R)[None, :, None, None]).astype(np.float32)
    )
    enc = FSEncoderPSP(R)
    variables = enc.init(jax.random.PRNGKey(0), x, seg)
    return x, seg, variables


def test_encoder_channels_last_equals_nchw(enc_setup):
    x, seg, variables = enc_setup
    codes, feats = FSEncoderPSP(R).apply(variables, x, seg)
    codes_cl, feats_cl = FSEncoderPSP(R, channels_last=True).apply(
        variables, jnp.transpose(x, (0, 2, 3, 1)), seg
    )
    assert feats_cl.shape == feats.shape  # structure_feats stay NCHW-shaped
    np.testing.assert_allclose(
        np.asarray(codes_cl), np.asarray(codes), rtol=2e-3, atol=2e-4
    )


def test_masked_region_mean_channels_last():
    rng = np.random.RandomState(1)
    feats = jnp.asarray(rng.randn(2, 32, 16, 16).astype(np.float32))
    lab = rng.randint(0, R, size=(2, 16, 16))
    seg = jnp.asarray(
        (lab[:, None] == np.arange(R)[None, :, None, None]).astype(np.float32)
    )
    want = masked_region_mean(feats, seg)
    got = masked_region_mean(
        jnp.transpose(feats, (0, 2, 3, 1)), seg, channels_last=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)
