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
