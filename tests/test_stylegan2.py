"""Generator / Discriminator / Net3 structural and equivalence tests.

The critical check: the full generator with the factorised fast masked conv
equals the region-loop (reference-semantics) path on identical params/noise.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from e4s_tpu.models.stylegan2 import Generator, Discriminator
from e4s_tpu.models.net3 import Net3

SIZE = 64  # small generator: log_size=6, n_latent=10
K = 7
R = 12


def _onehot_mask(rng, B, size):
    labels = rng.randint(0, R, size=(B, size, size))
    onehot = np.zeros((B, R, size, size), dtype=np.float32)
    for b in range(B):
        for r in range(R):
            onehot[b, r] = labels[b] == r
    return jnp.asarray(onehot)


@pytest.fixture(scope="module")
def gen_setup():
    gen = Generator(size=SIZE, remaining_layer_idx=K, fast_masked=True)
    rng = np.random.RandomState(0)
    B = 2
    latent = jnp.asarray(rng.randn(B, R, 10, 512).astype(np.float32) * 0.1)
    mask = _onehot_mask(rng, B, SIZE)
    variables = gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        [latent], None, mask, input_is_latent=True, randomize_noise=False,
    )
    return gen, variables, latent, mask


def test_generator_shapes(gen_setup):
    gen, variables, latent, mask = gen_setup
    img, lat, feats = gen.apply(
        variables, [latent], None, mask,
        input_is_latent=True, randomize_noise=False, return_latents=True,
    )
    assert img.shape == (2, 3, SIZE, SIZE)
    assert lat.shape == latent.shape
    # intermediate feats captured after conv1 of the split layer
    assert feats is not None


def test_fast_masked_equals_naive_full_generator(gen_setup):
    gen, variables, latent, mask = gen_setup
    img_fast, _, _ = gen.apply(
        variables, [latent], None, mask,
        input_is_latent=True, randomize_noise=False,
    )
    gen_naive = Generator(size=SIZE, remaining_layer_idx=K, fast_masked=False)
    img_naive, _, _ = gen_naive.apply(
        variables, [latent], None, mask,
        input_is_latent=True, randomize_noise=False,
    )
    np.testing.assert_allclose(
        np.asarray(img_fast), np.asarray(img_naive), rtol=5e-3, atol=5e-4
    )


def test_channels_last_equals_nchw_full_generator(gen_setup):
    """The NHWC synthesis path consumes the SAME variables (params stay in
    torch layouts) and must reproduce the NCHW output exactly."""
    gen, variables, latent, mask = gen_setup
    img_nchw, _, feats_nchw = gen.apply(
        variables, [latent], None, mask,
        input_is_latent=True, randomize_noise=False,
    )
    gen_cl = Generator(size=SIZE, remaining_layer_idx=K, channels_last=True)
    img_cl, _, feats_cl = gen_cl.apply(
        variables, [latent], None, mask,
        input_is_latent=True, randomize_noise=False,
    )
    assert img_cl.shape == img_nchw.shape  # public contract stays NCHW
    np.testing.assert_allclose(
        np.asarray(img_cl), np.asarray(img_nchw), rtol=5e-3, atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(feats_cl), np.asarray(feats_nchw), rtol=5e-3, atol=5e-4
    )


def test_generator_randomize_noise_runs(gen_setup):
    gen, variables, latent, mask = gen_setup
    img, _, _ = gen.apply(
        variables, [latent], None, mask,
        input_is_latent=True, randomize_noise=True,
        rngs={"noise": jax.random.PRNGKey(7)},
    )
    assert img.shape == (2, 3, SIZE, SIZE)


def test_generator_z_input(gen_setup):
    gen, variables, latent, mask = gen_setup
    z = jnp.asarray(np.random.RandomState(3).randn(2, 512).astype(np.float32))
    img, _, _ = gen.apply(
        variables, [z], None, mask, input_is_latent=False, randomize_noise=False,
    )
    assert img.shape == (2, 3, SIZE, SIZE)


def test_discriminator_shapes():
    disc = Discriminator(size=SIZE)
    x = jnp.asarray(np.random.RandomState(1).randn(4, 3, SIZE, SIZE).astype(np.float32))
    variables = disc.init(jax.random.PRNGKey(0), x)
    out = disc.apply(variables, x)
    assert out.shape == (4, 1)


@pytest.fixture(scope="module")
def net3_setup():
    net = Net3(out_size=SIZE, remaining_layer_idx=K, n_styles=10)
    rng = np.random.RandomState(2)
    img = jnp.asarray(rng.randn(2, 3, SIZE, SIZE).astype(np.float32))
    mask = _onehot_mask(rng, 2, SIZE)
    latent_avg = jnp.asarray(rng.randn(10, 512).astype(np.float32) * 0.1)
    variables = net.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        img, mask, latent_avg=latent_avg, randomize_noise=False,
    )
    return net, variables, img, mask, latent_avg


def test_net3_forward(net3_setup):
    net, variables, img, mask, latent_avg = net3_setup
    out, feats, latent = net.apply(
        variables, img, mask, latent_avg=latent_avg,
        randomize_noise=False, return_latents=True,
    )
    assert out.shape == (2, 3, SIZE, SIZE)
    assert latent.shape == (2, R, 10, 512)


def test_net3_style_vector_roundtrip(net3_setup):
    net, variables, img, mask, latent_avg = net3_setup
    sv, feats = net.apply(variables, img, mask, method=Net3.get_style_vectors)
    assert sv.shape == (2, R, 1280)
    codes = net.apply(
        variables, sv, latent_avg, method=Net3.cal_style_codes
    )
    assert codes.shape == (2, R, 10, 512)
    img_out, _, _ = net.apply(
        variables, jnp.zeros((2, 512, 16, 16)), codes, mask,
        method=Net3.gen_img, randomize_noise=False,
    )
    assert img_out.shape == (2, 3, SIZE, SIZE)


def test_net3_forward_equals_manual_pipeline(net3_setup):
    """forward == get_style_vectors -> cal_style_codes -> gen_img."""
    net, variables, img, mask, latent_avg = net3_setup
    out_direct, _ = net.apply(
        variables, img, mask, latent_avg=latent_avg, randomize_noise=False,
    )
    sv, _ = net.apply(variables, img, mask, method=Net3.get_style_vectors)
    codes = net.apply(variables, sv, latent_avg, method=Net3.cal_style_codes)
    out_manual, _, _ = net.apply(
        variables, jnp.zeros((2, 512, 16, 16)), codes, mask,
        method=Net3.gen_img, randomize_noise=False,
    )
    np.testing.assert_allclose(
        np.asarray(out_direct), np.asarray(out_manual), rtol=1e-5, atol=1e-5
    )


def test_packed_tail_equals_unpacked(gen_setup, monkeypatch):
    """The packed (space-to-depth) final octave is an exact relabeling: the
    NHWC generator with the packed tail forced on must reproduce the plain
    NHWC output (registered noise buffers, full generator)."""
    gen, variables, latent, mask = gen_setup
    gen_cl = Generator(size=SIZE, remaining_layer_idx=K, channels_last=True)
    monkeypatch.setenv("E4S_TPU_PACKED_TAIL", "0")
    want, _, _ = gen_cl.apply(
        variables, [latent], None, mask,
        input_is_latent=True, randomize_noise=False,
    )
    monkeypatch.setenv("E4S_TPU_PACKED_TAIL", "1")
    monkeypatch.setenv("E4S_TPU_PACKED_MIN_RES", "8")
    got, _, _ = gen_cl.apply(
        variables, [latent], None, mask,
        input_is_latent=True, randomize_noise=False,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=5e-3, atol=5e-4
    )


def test_packed_tail_multi_octave_equals_unpacked(monkeypatch):
    """With a lower K, TWO octaves are unmasked and packing engages on a
    non-final octave too — covering the inter-octave depth-to-space handoff
    (features unpacked for the next octave's consumption)."""
    gen_cl = Generator(size=SIZE, remaining_layer_idx=5, channels_last=True)
    rng = np.random.RandomState(3)
    latent = jnp.asarray(rng.randn(1, R, 10, 512).astype(np.float32) * 0.1)
    mask = _onehot_mask(rng, 1, SIZE)
    monkeypatch.setenv("E4S_TPU_PACKED_TAIL", "0")
    variables = gen_cl.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        [latent], None, mask, input_is_latent=True, randomize_noise=False,
    )
    want, _, _ = gen_cl.apply(
        variables, [latent], None, mask,
        input_is_latent=True, randomize_noise=False,
    )
    monkeypatch.setenv("E4S_TPU_PACKED_TAIL", "1")
    monkeypatch.setenv("E4S_TPU_PACKED_MIN_RES", "8")
    got, _, _ = gen_cl.apply(
        variables, [latent], None, mask,
        input_is_latent=True, randomize_noise=False,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=5e-3, atol=5e-4
    )


@pytest.mark.parametrize("noise_channels", [1, 24])
def test_styledconv_packed_supplied_noise(noise_channels, monkeypatch):
    """StyledConv packed path with caller-supplied noise (public NCHW
    contract: [B,1,H,W] buffers or full-channel [B,C,H,W] — the edit
    pipeline's fixed noise) must equal the unpacked NHWC path."""
    from e4s_tpu.models.stylegan2 import StyledConv
    from e4s_tpu.ops.modconv import depth_to_space2

    rng = np.random.RandomState(4)
    B, Ci, Co, H = 2, 16, 24, 8
    x = jnp.asarray(rng.randn(B, H, H, Ci).astype(np.float32))
    style = jnp.asarray(rng.randn(B, 512).astype(np.float32))
    noise = jnp.asarray(
        rng.randn(B, noise_channels, 2 * H, 2 * H).astype(np.float32)
    )
    m = StyledConv(Ci, Co, 3, 512, upsample=True, channels_last=True)
    variables = m.init(
        {"params": jax.random.PRNGKey(0)}, x, style, None, noise=noise
    )
    want = m.apply(variables, x, style, None, noise=noise)
    got = depth_to_space2(
        m.apply(variables, x, style, None, noise=noise, packed_out=True)
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
    )
