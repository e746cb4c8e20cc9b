"""Torch-parity resize / pooling ops, checked against torch (CPU) directly."""

import numpy as np
import pytest

import jax.numpy as jnp

import torch
import torch.nn.functional as TF

from e4s_tpu.ops.resize import nearest_resize, bilinear_resize, adaptive_avg_pool2d
from e4s_tpu.ops.masked_pool import masked_region_mean


@pytest.mark.parametrize("shape,size", [((2, 3, 64, 64), (256, 256)),
                                        ((2, 12, 64, 64), (16, 16)),
                                        ((1, 1, 37, 53), (17, 29))])
def test_nearest_matches_torch(shape, size):
    x = np.random.RandomState(0).randn(*shape).astype(np.float32)
    want = TF.interpolate(torch.from_numpy(x), size=size, mode="nearest").numpy()
    got = np.asarray(nearest_resize(jnp.asarray(x), size))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("shape,size,ac", [((2, 3, 64, 64), (16, 16), False),
                                           ((1, 3, 32, 32), (128, 128), False),
                                           ((1, 2, 15, 15), (16, 16), True)])
def test_bilinear_matches_torch(shape, size, ac):
    x = np.random.RandomState(1).randn(*shape).astype(np.float32)
    want = TF.interpolate(
        torch.from_numpy(x), size=size, mode="bilinear", align_corners=ac
    ).numpy()
    got = np.asarray(bilinear_resize(jnp.asarray(x), size, align_corners=ac))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("size", [(32, 32), (1, 1), (7, 7)])
def test_adaptive_avg_pool_matches_torch(size):
    x = np.random.RandomState(2).randn(2, 4, 64, 64).astype(np.float32)
    want = TF.adaptive_avg_pool2d(torch.from_numpy(x), size).numpy()
    got = np.asarray(adaptive_avg_pool2d(jnp.asarray(x), size))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_masked_region_mean_matches_loop():
    """Vectorised masked pooling == the reference's per-(sample, region) loop
    (ref: src/models/encoders/psp_encoders.py:264-283)."""
    rng = np.random.RandomState(3)
    B, F, H, W, R = 2, 6, 16, 16, 12
    feats = rng.randn(B, F, H, W).astype(np.float32)
    labels = rng.randint(0, 5, size=(B, 64, 64))  # only regions 0-4 present
    seg = np.zeros((B, R, 64, 64), dtype=np.float32)
    for b in range(B):
        for r in range(R):
            seg[b, r] = labels[b] == r

    got = np.asarray(masked_region_mean(jnp.asarray(feats), jnp.asarray(seg)))

    # loop oracle (uses the same nearest resize)
    seg_r = np.asarray(nearest_resize(jnp.asarray(seg), (H, W)))
    want = np.zeros((B, R, F), dtype=np.float32)
    for b in range(B):
        for r in range(R):
            m = seg_r[b, r] > 0
            if m.sum() > 0:
                want[b, r] = feats[b][:, m].mean(axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # empty regions exactly zero
    assert np.all(got[:, 5:] == 0)
