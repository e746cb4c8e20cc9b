"""GPEN stack structural tests (small configs; full config is ckpt-shaped)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from e4s_tpu.models.gpen.gpen_model import GPENFullGenerator, gpen_channels
from e4s_tpu.models.gpen.parsenet import ParseNet, parse_mask
from e4s_tpu.models.gpen.retinaface import (
    RetinaFace,
    decode_boxes,
    prior_boxes,
    py_cpu_nms,
)
from e4s_tpu.models.gpen.rrdbnet import RRDBNet, pixel_unshuffle
from e4s_tpu.models.gpen.align_faces import (
    get_reference_facial_points,
    umeyama,
)


def test_gpen_full_generator_shapes():
    model = GPENFullGenerator(size=64)
    x = jnp.zeros((1, 3, 64, 64))
    variables = model.init(jax.random.PRNGKey(0), x)
    out, _ = model.apply(variables, x)
    assert out.shape == (1, 3, 64, 64)


def test_rrdbnet_x4():
    model = RRDBNet(scale=4, num_block=2)
    x = jnp.zeros((1, 3, 16, 16))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (1, 3, 64, 64)


def test_pixel_unshuffle():
    x = jnp.arange(16.0).reshape(1, 1, 4, 4)
    out = pixel_unshuffle(x, 2)
    assert out.shape == (1, 4, 2, 2)


def test_parsenet_shapes():
    model = ParseNet(in_size=64, out_size=64)
    x = jnp.zeros((1, 3, 64, 64))
    variables = model.init(jax.random.PRNGKey(0), x)
    mask_logits, out_img = model.apply(variables, x)
    assert mask_logits.shape == (1, 19, 64, 64)
    assert out_img.shape == (1, 3, 64, 64)
    m = parse_mask(mask_logits)
    assert m.shape == (1, 64, 64)
    assert set(np.unique(np.asarray(m))) <= {0.0, 255.0}


def test_retinaface_shapes():
    model = RetinaFace()
    x = jnp.zeros((1, 3, 128, 128))
    variables = model.init(jax.random.PRNGKey(0), x)
    bbox, cls, ldm = model.apply(variables, x)
    n_priors = prior_boxes((128, 128)).shape[0]
    assert bbox.shape == (1, n_priors, 4)
    assert cls.shape == (1, n_priors, 2)
    assert ldm.shape == (1, n_priors, 10)
    np.testing.assert_allclose(np.asarray(cls).sum(-1), 1.0, rtol=1e-5)


def test_nms_and_decode():
    priors = prior_boxes((64, 64))
    loc = np.zeros((priors.shape[0], 4), np.float32)
    boxes = decode_boxes(loc, priors)
    assert boxes.shape == priors.shape
    dets = np.array(
        [[0, 0, 10, 10, 0.9], [1, 1, 11, 11, 0.8], [30, 30, 40, 40, 0.7]],
        np.float32,
    )
    keep = py_cpu_nms(dets, 0.4)
    assert keep == [0, 2]


def test_umeyama_recovers_similarity():
    rng = np.random.RandomState(0)
    src = rng.rand(5, 2) * 100
    theta = 0.3
    R = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    dst = 1.7 * src @ R.T + np.array([5.0, -3.0])
    T, scale = umeyama(src, dst)
    np.testing.assert_allclose(scale, 1.7, rtol=1e-6)
    src_h = np.hstack([src, np.ones((5, 1))])
    mapped = (T @ src_h.T).T[:, :2]
    np.testing.assert_allclose(mapped, dst, atol=1e-6)


def test_reference_points_e4s_config():
    pts = get_reference_facial_points((512, 512), 0.25, (0, 0), True)
    assert pts.shape == (5, 2)
    assert 0 < pts.min() and pts.max() < 512


def test_gpen_full_generator_sr_shapes():
    from e4s_tpu.models.gpen.gpen_model import GPENFullGeneratorSR

    model = GPENFullGeneratorSR(in_size=32, out_size=64)
    x = jnp.zeros((1, 3, 32, 32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out, _ = model.apply(variables, x)
    assert out.shape == (1, 3, 64, 64)
    # with a noise rng stream the top scales get random injection
    out2, _ = model.apply(variables, x, rngs={"noise": jax.random.PRNGKey(1)})
    assert out2.shape == (1, 3, 64, 64)
