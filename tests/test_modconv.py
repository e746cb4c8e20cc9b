"""Masked modulated conv: fast factorised path == region-loop reference.

The naive path reproduces the reference semantics (12 convs + one-hot masked
sum, ref: src/models/stylegan2/model.py:386-400) with the region loop folded
into the batch; the fast path must match it to float32 tolerance. We also
check the plain modulated conv against a direct per-sample-weight oracle.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from e4s_tpu.ops.modconv import (
    demod_coeff,
    modulated_conv2d,
    masked_modulated_conv2d,
    masked_modulated_conv2d_naive,
    masked_torgb,
)
from e4s_tpu.ops.resize import nearest_resize


def _rand_onehot_mask(rng, B, R, H, W):
    labels = rng.randint(0, R, size=(B, H, W))
    onehot = np.zeros((B, R, H, W), dtype=np.float32)
    for b in range(B):
        for r in range(R):
            onehot[b, r] = labels[b] == r
    return onehot


def _oracle_modconv(x, w, s, demodulate):
    """Per-sample weight modulation oracle (reference fused path, no up/down).

    w_eff[b] = w * s[b, None, :, None, None]; demod over (i,kh,kw).
    """
    B = x.shape[0]
    outs = []
    for b in range(B):
        wb = w * s[b][None, :, None, None]
        if demodulate:
            d = 1.0 / np.sqrt(np.sum(wb**2, axis=(1, 2, 3)) + 1e-8)
            wb = wb * d[:, None, None, None]
        # correlation, padding k//2
        k = w.shape[-1]
        p = k // 2
        xp = np.pad(x[b], ((0, 0), (p, p), (p, p)))
        Co = w.shape[0]
        H, W = x.shape[-2:]
        out = np.zeros((Co, H, W))
        for ty in range(k):
            for tx in range(k):
                out += np.einsum(
                    "oi,ihw->ohw", wb[:, :, ty, tx], xp[:, ty : ty + H, tx : tx + W]
                )
        outs.append(out)
    return np.stack(outs)


@pytest.mark.parametrize("demodulate", [True, False])
def test_modulated_conv_matches_oracle(demodulate):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 12, 12).astype(np.float32)
    w = (rng.randn(16, 8, 3, 3) * 0.1).astype(np.float32)
    s = (rng.randn(2, 8) * 0.5 + 1.0).astype(np.float32)
    got = np.asarray(
        modulated_conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(s), demodulate=demodulate)
    )
    want = _oracle_modconv(x, w, s, demodulate)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("demodulate", [True, False])
@pytest.mark.parametrize("up", [False, True])
def test_masked_fast_equals_naive(demodulate, up):
    rng = np.random.RandomState(1)
    B, R, Ci, Co, H = 2, 12, 8, 16, 16
    x = rng.randn(B, Ci, H, H).astype(np.float32)
    w = (rng.randn(Co, Ci, 3, 3) * 0.1).astype(np.float32)
    s = (rng.randn(B, R, Ci) * 0.5 + 1.0).astype(np.float32)
    mask = _rand_onehot_mask(rng, B, R, 64, 64)  # full-res mask, resized inside

    naive = np.asarray(
        masked_modulated_conv2d_naive(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(s), jnp.asarray(mask),
            demodulate=demodulate, up=up,
        )
    )
    fast = np.asarray(
        masked_modulated_conv2d(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(s), jnp.asarray(mask),
            demodulate=demodulate, up=up,
        )
    )
    assert naive.shape == fast.shape == (B, Co, H * (2 if up else 1), H * (2 if up else 1))
    np.testing.assert_allclose(fast, naive, rtol=2e-4, atol=2e-4)


def test_masked_torgb_equals_naive():
    rng = np.random.RandomState(2)
    B, R, Ci, H = 2, 12, 8, 16
    x = rng.randn(B, Ci, H, H).astype(np.float32)
    w = (rng.randn(3, Ci, 1, 1) * 0.1).astype(np.float32)
    s = (rng.randn(B, R, Ci) * 0.5 + 1.0).astype(np.float32)
    mask = _rand_onehot_mask(rng, B, R, 64, 64)

    naive = np.asarray(
        masked_modulated_conv2d_naive(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(s), jnp.asarray(mask),
            demodulate=False, up=False,
        )
    )
    fast = np.asarray(
        masked_torgb(jnp.asarray(x), jnp.asarray(w), jnp.asarray(s), jnp.asarray(mask))
    )
    np.testing.assert_allclose(fast, naive, rtol=1e-4, atol=1e-4)


def test_demod_coeff_shape():
    rng = np.random.RandomState(3)
    w = jnp.asarray(rng.randn(16, 8, 3, 3).astype(np.float32))
    s = jnp.asarray(rng.randn(2, 12, 8).astype(np.float32))
    d = demod_coeff(w, s)
    assert d.shape == (2, 12, 16)


def test_empty_region_contributes_zero():
    """Regions absent from the mask must not affect the output."""
    rng = np.random.RandomState(4)
    B, R, Ci, Co, H = 1, 12, 4, 8, 8
    x = rng.randn(B, Ci, H, H).astype(np.float32)
    w = (rng.randn(Co, Ci, 3, 3) * 0.1).astype(np.float32)
    s1 = (rng.randn(B, R, Ci)).astype(np.float32)
    s2 = s1.copy()
    s2[:, 5] = 999.0  # region 5 style perturbed
    mask = np.zeros((B, R, 32, 32), dtype=np.float32)
    mask[:, 0] = 1.0  # everything is region 0 -> region 5 never used
    o1 = np.asarray(masked_modulated_conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(s1), jnp.asarray(mask)))
    o2 = np.asarray(masked_modulated_conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(s2), jnp.asarray(mask)))
    np.testing.assert_allclose(o1, o2, rtol=1e-6, atol=1e-6)


# ---------------------------------------------------------------------------
# NHWC (channels-last) twins must match the NCHW paths exactly.
# ---------------------------------------------------------------------------


def _mk_inputs(seed=0, B=2, R=12, Ci=16, Co=24, H=16, W=16):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, Ci, H, W).astype(np.float32))
    w = jnp.asarray((rng.randn(Co, Ci, 3, 3) * 0.1).astype(np.float32))
    s = jnp.asarray((rng.rand(B, R, Ci) + 0.5).astype(np.float32))
    lab = rng.randint(0, R, (B, 2 * H, 2 * W))
    mask = jnp.asarray(
        (lab[:, None] == np.arange(R)[None, :, None, None]).astype(np.float32)
    )
    return x, w, s, mask


@pytest.mark.parametrize("up", [False, True])
@pytest.mark.parametrize("demodulate", [False, True])
def test_masked_nhwc_equals_nchw(demodulate, up):
    from e4s_tpu.ops.modconv import masked_modulated_conv2d_nhwc

    x, w, s, mask = _mk_inputs()
    want = masked_modulated_conv2d(x, w, s, mask, demodulate=demodulate, up=up)
    got = masked_modulated_conv2d_nhwc(
        jnp.transpose(x, (0, 2, 3, 1)), w, s, mask, demodulate=demodulate, up=up
    )
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(got, (0, 3, 1, 2))), np.asarray(want),
        rtol=1e-5, atol=1e-5,
    )


def test_torgb_nhwc_equals_nchw():
    from e4s_tpu.ops.modconv import masked_torgb_nhwc

    x, _, s, mask = _mk_inputs()
    w1 = jnp.asarray(
        (np.random.RandomState(3).randn(3, x.shape[1], 1, 1) * 0.1).astype(
            np.float32
        )
    )
    want = masked_torgb(x, w1, s, mask)
    got = masked_torgb_nhwc(jnp.transpose(x, (0, 2, 3, 1)), w1, s, mask)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(got, (0, 3, 1, 2))), np.asarray(want),
        rtol=1e-5, atol=1e-5,
    )


@pytest.mark.parametrize("mode", ["plain", "up", "down"])
def test_unmasked_nhwc_equals_nchw(mode):
    from e4s_tpu.ops.modconv import modulated_conv2d_nhwc

    x, w, s, _ = _mk_inputs()
    s1 = s[:, 0]
    kw = {"up": mode == "up", "down": mode == "down"}
    want = modulated_conv2d(x, w, s1, **kw)
    got = modulated_conv2d_nhwc(jnp.transpose(x, (0, 2, 3, 1)), w, s1, **kw)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(got, (0, 3, 1, 2))), np.asarray(want),
        rtol=1e-5, atol=1e-5,
    )


@pytest.mark.parametrize("demodulate", [True, False])
def test_unmasked_up_stacked_equals_convt(demodulate, monkeypatch):
    """Stacked-polyphase upsample (one conv + depth-to-space) must equal the
    conv_transpose+blur formulation (the TPU dispatch default)."""
    from e4s_tpu.ops.modconv import modulated_conv2d_nhwc

    x, w, s, _ = _mk_inputs()
    s1 = s[:, 0]
    xl = jnp.transpose(x, (0, 2, 3, 1))
    monkeypatch.setenv("E4S_TPU_UP_STACKED", "0")
    want = modulated_conv2d_nhwc(xl, w, s1, up=True, demodulate=demodulate)
    monkeypatch.setenv("E4S_TPU_UP_STACKED", "1")
    got = modulated_conv2d_nhwc(xl, w, s1, up=True, demodulate=demodulate)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4,
    )


# ---------------------------------------------------------------------------
# Packed (space-to-depth) tail domain
# ---------------------------------------------------------------------------


def test_space_depth_roundtrip():
    from e4s_tpu.ops.modconv import depth_to_space2, space_to_depth2

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 10, 6).astype(np.float32))
    p = space_to_depth2(x)
    assert p.shape == (2, 4, 5, 24)
    np.testing.assert_array_equal(np.asarray(depth_to_space2(p)), np.asarray(x))
    # phase-major layout: packed[..., (a*2+b)*C + c] == x[:, 2i+a, 2j+b, c]
    np.testing.assert_array_equal(
        np.asarray(p[0, 1, 2, 6 + 3]), np.asarray(x[0, 2, 5, 3])
    )


@pytest.mark.parametrize("demodulate", [True, False])
def test_packed_up_conv_equals_unpacked(demodulate):
    from e4s_tpu.ops.modconv import (
        modulated_conv2d_nhwc,
        modulated_conv2d_nhwc_up_packed,
        space_to_depth2,
    )

    x, w, s, _ = _mk_inputs()
    s1 = s[:, 0]
    xl = jnp.transpose(x, (0, 2, 3, 1))
    want = space_to_depth2(
        modulated_conv2d_nhwc(xl, w, s1, up=True, demodulate=demodulate)
    )
    got = modulated_conv2d_nhwc_up_packed(xl, w, s1, demodulate=demodulate)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("demodulate", [True, False])
def test_packed_stride1_conv_equals_unpacked(demodulate):
    from e4s_tpu.ops.modconv import (
        modulated_conv2d_nhwc,
        modulated_conv2d_nhwc_packed,
        depth_to_space2,
        space_to_depth2,
    )

    x, w, s, _ = _mk_inputs()
    s1 = s[:, 0]
    xl = jnp.transpose(x, (0, 2, 3, 1))
    want = modulated_conv2d_nhwc(xl, w, s1, demodulate=demodulate)
    got = depth_to_space2(
        modulated_conv2d_nhwc_packed(
            space_to_depth2(xl), w, s1, demodulate=demodulate
        )
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
    )


def test_packed_torgb_equals_unpacked():
    from e4s_tpu.ops.modconv import (
        depth_to_space2,
        space_to_depth2,
        torgb_nhwc_packed,
    )

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
    w = jnp.asarray((rng.randn(3, 16, 1, 1) * 0.1).astype(np.float32))
    s = jnp.asarray((rng.rand(2, 16) + 0.5).astype(np.float32))
    xm = x * s[:, None, None, :]
    want = jnp.einsum("bhwi,io->bhwo", xm, w[:, :, 0, 0].T)
    got = depth_to_space2(torgb_nhwc_packed(space_to_depth2(x), w, s))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_upsample2_packed_equals_upsample2():
    from e4s_tpu.ops.modconv import space_to_depth2
    from e4s_tpu.ops.upfirdn2d import upsample2, upsample2_packed

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 9, 7, 3).astype(np.float32))
    want = space_to_depth2(upsample2(x, channels_last=True))
    got = upsample2_packed(x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_packed_stride1_grads_equal_unpacked():
    """Training differentiates the packed tail; grads must match the
    unpacked formulation (both are plain XLA ops — this guards the packed
    kernel scatter construction's differentiability and correctness)."""
    import jax

    from e4s_tpu.ops.modconv import (
        depth_to_space2,
        modulated_conv2d_nhwc,
        modulated_conv2d_nhwc_packed,
        space_to_depth2,
    )

    x, w, s, _ = _mk_inputs()
    s1 = s[:, 0]
    xl = jnp.transpose(x, (0, 2, 3, 1))

    def loss_unpacked(xl, w, s1):
        return jnp.sum(modulated_conv2d_nhwc(xl, w, s1) ** 2)

    def loss_packed(xl, w, s1):
        out = modulated_conv2d_nhwc_packed(space_to_depth2(xl), w, s1)
        return jnp.sum(depth_to_space2(out) ** 2)

    g_want = jax.grad(loss_unpacked, argnums=(0, 1, 2))(xl, w, s1)
    g_got = jax.grad(loss_packed, argnums=(0, 1, 2))(xl, w, s1)
    for a, b in zip(g_got, g_want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3
        )
