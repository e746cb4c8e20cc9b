"""Native preprocessing kernels vs numpy reference."""

import numpy as np

from e4s_tpu.datasets import native
from e4s_tpu.datasets.dataset import (
    ffhq_mask_to_faceparser_mask_detailed,
    to_tensor,
)


def test_to_tensor_normalize_matches_numpy():
    rng = np.random.RandomState(0)
    img = (rng.rand(37, 53, 3) * 255).astype(np.uint8)
    want = np.transpose(img.astype(np.float32) / 255.0, (2, 0, 1))
    got01 = native.to_tensor_normalize(img, normalize=False)
    np.testing.assert_allclose(got01, want, atol=1e-6)
    got = native.to_tensor_normalize(img, normalize=True)
    np.testing.assert_allclose(got, want * 2 - 1, atol=1e-6)


def test_remap_and_onehot_matches_converter():
    rng = np.random.RandomState(1)
    lab = (rng.rand(64, 64) * 19).astype(np.uint8)
    pairs = [([12, 13], 1), ([2, 3], 2), ([4, 5], 3), ([17], 4), ([10], 5),
             ([1], 6), ([7, 8], 7), ([14], 8), ([11], 9), ([6], 10), ([9], 11)]
    lut = native.make_lut(pairs)
    labels, onehot = native.remap_and_onehot(lab, lut)
    np.testing.assert_array_equal(labels, ffhq_mask_to_faceparser_mask_detailed(lab))
    np.testing.assert_allclose(onehot.sum(0), 1.0)
    for c in range(12):
        np.testing.assert_array_equal(onehot[c] > 0, labels == c)


def test_hflip():
    rng = np.random.RandomState(2)
    x = rng.rand(3, 5, 7).astype(np.float32)
    got = native.hflip_chw(x.copy())
    np.testing.assert_array_equal(got, x[..., ::-1])


def test_to_tensor_uses_native_path():
    rng = np.random.RandomState(3)
    img = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
    out = to_tensor(img)
    assert out.shape == (3, 16, 16)
    assert 0.0 <= out.min() and out.max() <= 1.0
