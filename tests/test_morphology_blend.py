"""Morphology vs numpy oracle; pyramid blending invariants (+cv2 parity if present)."""

import numpy as np
import pytest

import jax.numpy as jnp

from e4s_tpu.ops.morphology import dilation, erosion, opening, closing, create_masks
from e4s_tpu.ops.blending import pyr_down, pyr_up, laplacian_blend


def _oracle(x, k, mode):
    """kornia geodesic-border flat morphology oracle."""
    B, C, H, W = x.shape
    kh, kw = k.shape
    oy, ox = kh // 2, kw // 2
    pad_val = -1e4 if mode == "dil" else 1e4
    xp = np.full((B, C, H + kh - 1, W + kw - 1), pad_val, dtype=np.float64)
    xp[:, :, oy : oy + H, ox : ox + W] = x
    out = np.empty_like(x, dtype=np.float64)
    red = np.max if mode == "dil" else np.min
    for i in range(H):
        for j in range(W):
            win = xp[:, :, i : i + kh, j : j + kw]
            sel = win[:, :, k[::-1, ::-1] != 0] if mode == "dil" else win[:, :, k != 0]
            out[:, :, i, j] = red(sel, axis=-1)
    return out


@pytest.mark.parametrize("ksize", [3, 5])
def test_dilation_erosion_match_oracle(ksize):
    rng = np.random.RandomState(0)
    x = rng.rand(1, 1, 12, 14).astype(np.float32)
    k = np.ones((ksize, ksize), dtype=np.float32)
    np.testing.assert_allclose(
        np.asarray(dilation(jnp.asarray(x), k)), _oracle(x, k, "dil"), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(erosion(jnp.asarray(x), k)), _oracle(x, k, "ero"), atol=1e-6
    )


def test_masked_kernel():
    rng = np.random.RandomState(1)
    x = rng.rand(1, 1, 10, 10).astype(np.float32)
    k = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], dtype=np.float32)  # cross SE
    np.testing.assert_allclose(
        np.asarray(dilation(jnp.asarray(x), k)), _oracle(x, k, "dil"), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(erosion(jnp.asarray(x), k)), _oracle(x, k, "ero"), atol=1e-6
    )


def test_open_close_binary_mask():
    m = np.zeros((1, 1, 16, 16), dtype=np.float32)
    m[0, 0, 4:12, 4:12] = 1.0
    k = np.ones((3, 3), dtype=np.float32)
    # opening/closing of a solid square with small SE is identity
    np.testing.assert_allclose(np.asarray(opening(jnp.asarray(m), k)), m, atol=1e-6)
    np.testing.assert_allclose(np.asarray(closing(jnp.asarray(m), k)), m, atol=1e-6)


def test_create_masks_ring():
    m = np.zeros((1, 1, 32, 32), dtype=np.float32)
    m[0, 0, 8:24, 8:24] = 1.0
    content, border, full = create_masks(jnp.asarray(m), outer_dilation=2)
    content, border, full = map(np.asarray, (content, border, full))
    assert np.array_equal(content, m)
    assert full.sum() > m.sum()
    assert np.all(border + m <= full + 1e-6)
    assert border.max() == 1.0 and border.min() == 0.0


def test_pyr_roundtrip_constant():
    x = jnp.full((1, 3, 64, 64), 7.0)
    d = pyr_down(x)
    assert d.shape == (1, 3, 32, 32)
    np.testing.assert_allclose(np.asarray(d), 7.0, rtol=1e-5)
    u = pyr_up(d)
    assert u.shape == (1, 3, 64, 64)
    np.testing.assert_allclose(np.asarray(u), 7.0, rtol=1e-5)


def test_blend_mask_extremes():
    rng = np.random.RandomState(2)
    a = jnp.asarray(rng.rand(1, 3, 64, 64).astype(np.float32) * 255)
    b = jnp.asarray(rng.rand(1, 3, 64, 64).astype(np.float32) * 255)
    ones = jnp.ones((1, 3, 64, 64))
    out_a = np.asarray(laplacian_blend(a, b, ones, num_levels=4))
    np.testing.assert_allclose(out_a, np.asarray(a), atol=1e-2)
    out_b = np.asarray(laplacian_blend(a, b, ones * 0, num_levels=4))
    np.testing.assert_allclose(out_b, np.asarray(b), atol=1e-2)


def test_pyr_matches_cv2_if_available():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(3)
    img = rng.rand(32, 32).astype(np.float32)
    want_d = cv2.pyrDown(img)
    got_d = np.asarray(pyr_down(jnp.asarray(img)[None, None]))[0, 0]
    np.testing.assert_allclose(got_d, want_d, atol=1e-5)
    want_u = cv2.pyrUp(img)
    got_u = np.asarray(pyr_up(jnp.asarray(img)[None, None]))[0, 0]
    np.testing.assert_allclose(got_u, want_u, atol=1e-5)
