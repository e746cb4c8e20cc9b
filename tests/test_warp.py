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
