"""upfirdn2d / fused_act vs independent numpy oracles.

The oracle implements the documented semantics directly (zero-stuff, pad,
true-convolve, stride — ``deps/score_sde_pytorch/op/upfirdn2d.py:159-200``)
with explicit loops, so it shares no code path with the XLA implementation.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from naturaldiffusion_tpu.ops.upfirdn2d import (upfirdn2d, upsample_2d,
                                                downsample_2d,
                                                upsample_conv_2d,
                                                conv_downsample_2d,
                                                _setup_kernel)
from naturaldiffusion_tpu.ops.fused_act import (fused_leaky_relu,
                                                fused_leaky_relu_pallas)


def oracle_upfirdn2d(x, k, up, down, pad0, pad1):
    """x: [N,H,W,C], k: [kh,kw]; loops, float64."""
    n, h, w, c = x.shape
    kh, kw = k.shape
    # zero-stuff
    z = np.zeros((n, h * up, w * up, c))
    z[:, ::up, ::up, :] = x
    # pad (positive) then crop (negative)
    z = np.pad(z, ((0, 0), (max(pad0, 0), max(pad1, 0)),
                   (max(pad0, 0), max(pad1, 0)), (0, 0)))
    padded = z[:, max(-pad0, 0):z.shape[1] - max(-pad1, 0),
               max(-pad0, 0):z.shape[2] - max(-pad1, 0), :]
    hp, wp = padded.shape[1], padded.shape[2]
    # true convolution (flip kernel) then stride
    oh = (hp - kh) // down + 1
    ow = (wp - kw) // down + 1
    out = np.zeros((n, oh, ow, c))
    kf = k[::-1, ::-1]
    for i in range(oh):
        for j in range(ow):
            patch = padded[:, i * down:i * down + kh, j * down:j * down + kw, :]
            out[:, i, j, :] = np.einsum("nhwc,hw->nc", patch, kf)
    return out


@pytest.mark.parametrize("up,down,pad,ksize", [
    (1, 1, (1, 1), 3), (2, 1, (2, 1), 4), (1, 2, (1, 1), 4),
    (2, 2, (3, 2), 4), (1, 1, (0, 0), 3), (3, 1, (2, 2), 3),
    (1, 1, (-1, 2), 4),
])
def test_upfirdn2d_matches_oracle(up, down, pad, ksize):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 6, 6, 3))
    k = rng.standard_normal((ksize, ksize))
    got = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k),
                               up=up, down=down, pad=pad))
    want = oracle_upfirdn2d(x, k, up, down, pad[0], pad[1])
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_upsample_downsample_shapes_and_dc_gain():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)))
    up = upsample_2d(x, k=[1, 3, 3, 1])
    assert up.shape == (2, 16, 16, 4)
    dn = downsample_2d(x, k=[1, 3, 3, 1])
    assert dn.shape == (2, 4, 4, 4)
    # a constant image stays constant under FIR resampling (DC gain 1) —
    # in the interior; borders attenuate from the implicit zero padding,
    # exactly as in the reference
    const = jnp.ones((1, 8, 8, 1))
    up_c = np.asarray(upsample_2d(const, k=[1, 3, 3, 1]))
    dn_c = np.asarray(downsample_2d(const, k=[1, 3, 3, 1]))
    np.testing.assert_allclose(up_c[:, 2:-2, 2:-2], 1.0, atol=1e-6)
    np.testing.assert_allclose(dn_c[:, 1:-1, 1:-1], 1.0, atol=1e-6)


def _oracle_conv(x, w, pad, stride=1):
    """Plain cross-correlation, loops, float64; x NHWC, w HWIO."""
    n, h, wd, cin = x.shape
    kh, kw, _, cout = w.shape
    xp = np.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    oh = (xp.shape[1] - kh) // stride + 1
    ow = (xp.shape[2] - kw) // stride + 1
    out = np.zeros((n, oh, ow, cout))
    for i in range(oh):
        for j in range(ow):
            patch = xp[:, i * stride:i * stride + kh, j * stride:j * stride + kw]
            out[:, i, j, :] = np.einsum("nhwc,hwco->no", patch, w)
    return out


def test_upsample_conv_matches_oracle():
    """Fused op == zero-stuff (between-only) -> full-pad correlate w -> FIR,
    composed from independent numpy oracles (the transposed-conv identity
    the reference builds on)."""
    rng = np.random.default_rng(2)
    f = 2
    x = rng.standard_normal((2, 6, 6, 3))
    w = rng.standard_normal((3, 3, 3, 5)) * 0.1
    fir = [1, 3, 3, 1]

    got = np.asarray(upsample_conv_2d(jnp.asarray(x), jnp.asarray(w), k=fir))

    # zero-stuff between samples only: (h-1)*f + 1
    h = x.shape[1]
    z = np.zeros((2, (h - 1) * f + 1, (h - 1) * f + 1, 3))
    z[:, ::f, ::f] = x
    y = _oracle_conv(z, w, pad=w.shape[0] - 1)        # full padding
    k2 = _setup_kernel(fir) * (f ** 2)
    p = (k2.shape[0] - f) - (w.shape[0] - 1)
    want = oracle_upfirdn2d(y, k2, 1, 1, (p + 1) // 2 + f - 1, p // 2 + 1)
    assert got.shape == (2, 12, 12, 5)
    np.testing.assert_allclose(got, want, atol=1e-8)


def test_conv_downsample_matches_oracle():
    rng = np.random.default_rng(3)
    f = 2
    x = rng.standard_normal((2, 8, 8, 3))
    w = rng.standard_normal((3, 3, 3, 5)) * 0.1
    fir = [1, 3, 3, 1]

    got = np.asarray(conv_downsample_2d(jnp.asarray(x), jnp.asarray(w), k=fir))

    k2 = _setup_kernel(fir)
    p = (k2.shape[0] - f) + (w.shape[0] - 1)
    y = oracle_upfirdn2d(x, k2, 1, 1, (p + 1) // 2, p // 2)
    want = _oracle_conv(y, w, pad=0, stride=f)
    assert got.shape == (2, 4, 4, 5)
    np.testing.assert_allclose(got, want, atol=1e-8)


def test_setup_kernel_normalizes():
    k = _setup_kernel([1, 3, 3, 1])
    assert k.shape == (4, 4)
    np.testing.assert_allclose(k.sum(), 1.0)


def test_fused_leaky_relu_semantics():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 8)))
    b = jnp.asarray(rng.standard_normal(8))
    got = np.asarray(fused_leaky_relu(x, b))
    xb = np.asarray(x) + np.asarray(b)
    want = np.where(xb >= 0, xb, 0.2 * xb) * np.sqrt(2.0)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_fused_leaky_relu_pallas_matches():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 128)), jnp.float32)
    b = jnp.asarray(rng.standard_normal(128), jnp.float32)
    got = np.asarray(fused_leaky_relu_pallas(x, b, interpret=True))
    want = np.asarray(fused_leaky_relu(x, b))
    np.testing.assert_allclose(got, want, atol=1e-6)
