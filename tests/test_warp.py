"""grid_sample parity vs torch (CPU)."""

import numpy as np

import jax.numpy as jnp
import torch
import torch.nn.functional as TF

from e4s_tpu.ops.warp import grid_sample_2d, grid_sample_3d


def test_grid_sample_2d_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 9, 11).astype(np.float32)
    grid = (rng.rand(2, 5, 7, 2).astype(np.float32) * 2.4 - 1.2)  # incl. OOB
    want = TF.grid_sample(
        torch.from_numpy(x), torch.from_numpy(grid),
        mode="bilinear", padding_mode="zeros", align_corners=False,
    ).numpy()
    got = np.asarray(grid_sample_2d(jnp.asarray(x), jnp.asarray(grid)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_grid_sample_3d_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 4, 5, 9, 11).astype(np.float32)
    grid = (rng.rand(2, 3, 5, 7, 3).astype(np.float32) * 2.4 - 1.2)
    want = TF.grid_sample(
        torch.from_numpy(x), torch.from_numpy(grid),
        mode="bilinear", padding_mode="zeros", align_corners=False,
    ).numpy()
    got = np.asarray(grid_sample_3d(jnp.asarray(x), jnp.asarray(grid)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_affine_warp_matches_cv2():
    """ops.warp.affine_warp vs cv2.warpAffine (bilinear, zero border) — the
    device twin of the GPEN restore glue warps
    (ref: src/pretrained/gpen/face_enhancement.py:69-95)."""
    import cv2

    from e4s_tpu.ops.warp import affine_warp

    rng = np.random.RandomState(0)
    img = (rng.rand(96, 96, 3) * 255).astype(np.float32)
    M = np.array([[0.8, 0.1, 5.0], [-0.05, 0.9, 3.0]], np.float32)
    want = cv2.warpAffine(img, M, (64, 72), flags=cv2.INTER_LINEAR)
    minv = cv2.invertAffineTransform(M)
    got = np.asarray(
        affine_warp(
            jnp.asarray(img.transpose(2, 0, 1)), jnp.asarray(minv), (72, 64)
        )
    ).transpose(1, 2, 0)
    assert np.abs(want - got).max() < 5e-3  # cv2 fixed-point vs float


def test_invert_affine_matches_cv2():
    import cv2

    from e4s_tpu.pipelines.reenact_restore import _invert_affine

    M = np.array([[0.8, 0.1, 5.0], [-0.05, 0.9, 3.0]], np.float32)
    np.testing.assert_allclose(
        _invert_affine(M), cv2.invertAffineTransform(M), rtol=1e-5, atol=1e-5
    )


def test_gaussian_blur_matches_cv2():
    """ops.warp.gaussian_blur_cv2 vs cv2.GaussianBlur((101,101), 11) — the
    GPEN mask feather (ref: face_enhancement.py:29-31,46-49)."""
    import cv2

    from e4s_tpu.ops.warp import gaussian_blur_cv2

    rng = np.random.RandomState(1)
    m = rng.rand(128, 128).astype(np.float32)
    want = cv2.GaussianBlur(m, (101, 101), 11)
    got = np.asarray(gaussian_blur_cv2(jnp.asarray(m), 101, 11.0))
    assert np.abs(want - got).max() < 1e-5


def test_antialiased_resize_matches_skimage_algorithm():
    """ops.resize.antialiased_resize vs the scipy oracle of skimage
    transform.resize (gaussian AA sigma=(f-1)/2 mirror + zoom order=1
    grid_mode) — the reference's fv2v input downscale
    (ref: scripts/face_swap.py:197)."""
    import scipy.ndimage as ndi

    from e4s_tpu.ops.resize import antialiased_resize

    rng = np.random.RandomState(2)
    img = rng.rand(64, 64).astype(np.float64)
    for out in (16, 20):
        f = 64 / out
        filt = ndi.gaussian_filter(img, (f - 1) / 2, mode="mirror")
        want = ndi.zoom(filt, out / 64, order=1, mode="mirror", grid_mode=True)
        got = np.asarray(
            antialiased_resize(jnp.asarray(img[None, None]), (out, out))
        )[0, 0]
        assert np.abs(want - got).max() < 1e-6
