"""upfirdn2d parity vs an independent numpy oracle.

The oracle implements the textbook definition (zero-stuff -> pad -> FIR
convolve -> decimate) directly in numpy, independently of both the reference
CUDA kernel and our XLA lowering.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from e4s_tpu.ops.upfirdn2d import upfirdn2d, make_kernel, upsample2, downsample2, blur


def upfirdn2d_oracle(x, kernel, up, down, pad0, pad1):
    """Direct numpy implementation of upfirdn2d semantics."""
    B, C, H, W = x.shape
    kh, kw = kernel.shape
    # zero-stuff: append (up-1) zeros after each sample
    up_h, up_w = H * up, W * up
    stuffed = np.zeros((B, C, up_h, up_w), dtype=np.float64)
    stuffed[:, :, ::up, ::up] = x
    # pad (possibly negative -> crop)
    def pad_axis(a, axis, p0, p1):
        pads = [(0, 0)] * a.ndim
        pads[axis] = (max(p0, 0), max(p1, 0))
        a = np.pad(a, pads)
        sl = [slice(None)] * a.ndim
        sl[axis] = slice(max(-p0, 0), a.shape[axis] - max(-p1, 0))
        return a[tuple(sl)]

    padded = pad_axis(pad_axis(stuffed, 2, pad0, pad1), 3, pad0, pad1)
    # FIR convolution (flip kernel, correlate)
    out_h = padded.shape[2] - kh + 1
    out_w = padded.shape[3] - kw + 1
    kf = kernel[::-1, ::-1]
    out = np.zeros((B, C, out_h, out_w), dtype=np.float64)
    for dy in range(kh):
        for dx in range(kw):
            out += kf[dy, dx] * padded[:, :, dy : dy + out_h, dx : dx + out_w]
    return out[:, :, ::down, ::down]


@pytest.mark.parametrize(
    "up,down,pad,k",
    [
        (1, 1, (1, 1), [1, 3, 3, 1]),
        (1, 1, (2, 1), [1, 3, 3, 1]),
        (2, 1, (2, 1), [1, 3, 3, 1]),
        (1, 2, (2, 2), [1, 3, 3, 1]),
        (2, 1, (1, 1), [1, 2, 1]),
        (1, 1, (0, 0), [1, 2, 1]),
        (1, 1, (-1, 2), [1, 3, 3, 1]),  # negative pad -> crop
    ],
)
def test_upfirdn2d_matches_oracle(up, down, pad, k):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 11, 13).astype(np.float32)
    kernel = np.asarray(make_kernel(k))
    got = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(kernel), up, down, pad))
    want = upfirdn2d_oracle(x.astype(np.float64), kernel.astype(np.float64), up, down, pad[0], pad[1])
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_upsample_downsample_shapes():
    x = jnp.ones((1, 4, 16, 16))
    assert upsample2(x).shape == (1, 4, 32, 32)
    assert downsample2(x).shape == (1, 4, 8, 8)
    # Blur used inside ConvLayer downsample path (k=3): pad (2, 1)
    assert blur(x, (1, 3, 3, 1), pad=(2, 1)).shape == (1, 4, 16, 16)


def test_upsample_constant_preserved():
    # A DC image must stay (approximately) DC under FIR up/down sampling.
    x = jnp.full((1, 1, 16, 16), 3.0)
    up = upsample2(x)
    assert np.allclose(np.asarray(up)[:, :, 4:-4, 4:-4], 3.0, atol=1e-5)
    down = downsample2(x)
    assert np.allclose(np.asarray(down)[:, :, 2:-2, 2:-2], 3.0, atol=1e-5)


def test_upfirdn2d_grad():
    import jax

    x = jnp.asarray(np.random.RandomState(1).randn(1, 2, 8, 8).astype(np.float32))
    k = make_kernel([1, 3, 3, 1])

    def f(x):
        return jnp.sum(upfirdn2d(x, k, up=2, down=1, pad=(2, 1)) ** 2)

    g = jax.grad(f)(x)
    assert g.shape == x.shape
    # numerical check on a single element
    eps = 1e-3
    xp = x.at[0, 0, 3, 3].add(eps)
    xm = x.at[0, 0, 3, 3].add(-eps)
    num = (f(xp) - f(xm)) / (2 * eps)
    assert np.allclose(num, g[0, 0, 3, 3], rtol=1e-2, atol=1e-3)
