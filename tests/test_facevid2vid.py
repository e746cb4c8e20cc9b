"""FaceVid2Vid structural tests (vox-256 config shapes)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from e4s_tpu.models.facevid2vid.driver import (
    FaceVid2Vid,
    get_rotation_matrix,
    headpose_pred_to_degree,
    keypoint_transformation,
)
from e4s_tpu.models.facevid2vid.keypoint_detector import KPDetector, HEEstimator
from e4s_tpu.models.facevid2vid.util import kp2gaussian, make_coordinate_grid_3d


def test_rotation_matrix_orthonormal():
    yaw = jnp.asarray([10.0, -30.0])
    pitch = jnp.asarray([5.0, 15.0])
    roll = jnp.asarray([0.0, 45.0])
    R = np.asarray(get_rotation_matrix(yaw, pitch, roll))
    for i in range(2):
        np.testing.assert_allclose(R[i] @ R[i].T, np.eye(3), atol=1e-5)
        assert np.linalg.det(R[i]) > 0.99


def test_headpose_bins_to_degree_range():
    pred = jnp.zeros((2, 66))
    deg = np.asarray(headpose_pred_to_degree(pred))
    # uniform softmax -> mean bin 32.5 -> 32.5*3-99 = -1.5
    np.testing.assert_allclose(deg, -1.5, atol=1e-4)


def test_coordinate_grid_and_gaussian():
    g = make_coordinate_grid_3d(4, 8, 8)
    assert g.shape == (4, 8, 8, 3)
    assert float(g[0, 0, 0, 2]) == -1.0 and float(g[-1, 0, 0, 2]) == 1.0
    kp = jnp.zeros((1, 2, 3))
    heat = kp2gaussian(kp, (4, 8, 8), 0.01)
    assert heat.shape == (1, 2, 4, 8, 8)
    # max at the grid point closest to the kp (centre)
    flat = np.asarray(heat[0, 0]).reshape(-1)
    assert flat.max() <= 1.0 + 1e-6


def test_keypoint_transformation_shapes():
    kp = {"value": jnp.zeros((2, 15, 3))}
    he = {
        "yaw": jnp.zeros((2, 66)),
        "pitch": jnp.zeros((2, 66)),
        "roll": jnp.zeros((2, 66)),
        "t": jnp.ones((2, 3)) * 0.1,
        "exp": jnp.zeros((2, 45)),
    }
    out = keypoint_transformation(kp, he)
    assert out["value"].shape == (2, 15, 3)


@pytest.mark.slow
def test_facevid2vid_full_drive():
    """Full re-enactment forward at 256^2 (random weights): shape + range."""
    model = FaceVid2Vid()
    rng = np.random.RandomState(0)
    S = rng.rand(1, 3, 256, 256).astype(np.float32)
    T = rng.rand(1, 3, 256, 256).astype(np.float32)
    out = np.asarray(model.drive(S, T))
    assert out.shape == (1, 3, 256, 256)
    assert 0.0 <= out.min() and out.max() <= 1.0
