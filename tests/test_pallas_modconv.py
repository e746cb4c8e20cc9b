"""Pallas patch-modulated-conv kernel vs the XLA path (interpret mode on CPU;
the same kernel is bit-exact compiled on TPU — see DESIGN.md §6)."""

import numpy as np
import pytest

import jax.numpy as jnp

from e4s_tpu.ops.modconv import _patch_mod_conv
from e4s_tpu.ops.pallas.modconv_tpu import patch_mod_conv3, pallas_supported_shape


@pytest.mark.parametrize("Ci,Co,H,W", [(32, 32, 16, 256), (16, 48, 8, 128)])
def test_pallas_matches_xla_interpret(Ci, Co, H, W):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, Ci, H, W).astype(np.float32))
    w = jnp.asarray((rng.randn(Co, Ci, 3, 3) * 0.05).astype(np.float32))
    smap = jnp.asarray(rng.randn(1, Ci, H, W).astype(np.float32))
    dmap = jnp.asarray(rng.randn(1, Co, H, W).astype(np.float32))
    want = np.asarray(_patch_mod_conv(x, w, smap, dmap))
    got = np.asarray(patch_mod_conv3(x, w, smap, dmap, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_supported_shape_gate():
    assert pallas_supported_shape(256, 256, 128, 128)
    assert not pallas_supported_shape(256, 100, 128, 128)  # W not /128
    assert not pallas_supported_shape(4, 128, 128, 128)  # H too small
    assert not pallas_supported_shape(128, 128, 512, 512)  # VMEM


def test_pallas_nhwc_entry_matches_xla_interpret():
    from e4s_tpu.ops.modconv import _patch_mod_conv_nhwc_xla
    from e4s_tpu.ops.pallas.modconv_tpu import patch_mod_conv3_nhwc

    rng = np.random.RandomState(1)
    B, Ci, Co, H, W = 1, 16, 32, 8, 128
    x = jnp.asarray(rng.randn(B, H, W, Ci).astype(np.float32))
    w = jnp.asarray((rng.randn(Co, Ci, 3, 3) * 0.05).astype(np.float32))
    smap = jnp.asarray(rng.randn(B, H, W, Ci).astype(np.float32))
    dmap = jnp.asarray(rng.randn(B, H, W, Co).astype(np.float32))
    want = np.asarray(_patch_mod_conv_nhwc_xla(x, w, smap, dmap))
    got = np.asarray(patch_mod_conv3_nhwc(x, w, smap, dmap, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pallas_dispatch_and_custom_vjp(monkeypatch):
    """Dispatch gate routes to the kernel (interpret mode here) and its
    custom_vjp reproduces the XLA path's gradients for every operand."""
    import jax

    from e4s_tpu.ops import modconv as mc

    monkeypatch.setenv("E4S_TPU_PALLAS", "interpret")
    rng = np.random.RandomState(2)
    B, Ci, Co, H, W = 1, 8, 16, 8, 128
    x = jnp.asarray(rng.randn(B, H, W, Ci).astype(np.float32))
    w = jnp.asarray((rng.randn(Co, Ci, 3, 3) * 0.05).astype(np.float32))
    smap = jnp.asarray(rng.randn(B, H, W, Ci).astype(np.float32))
    dmap = jnp.asarray(rng.randn(B, H, W, Co).astype(np.float32))

    out = mc._patch_mod_conv_nhwc(x, w, smap, dmap)
    want = mc._patch_mod_conv_nhwc_xla(x, w, smap, dmap)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(want), rtol=1e-5, atol=1e-5
    )

    f = lambda fn: lambda *a: jnp.sum(jnp.sin(fn(*a)))
    g_pallas = jax.grad(f(mc._patch_mod_conv_nhwc), argnums=(0, 1, 2, 3))(
        x, w, smap, dmap
    )
    g_xla = jax.grad(f(mc._patch_mod_conv_nhwc_xla), argnums=(0, 1, 2, 3))(
        x, w, smap, dmap
    )
    for got, want in zip(g_pallas, g_xla):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )
