"""Weighted-sum op tests: XLA path vs numpy, Pallas kernel (interpret mode on
CPU) vs XLA path, live-prefix masking semantics."""

import jax.numpy as jnp
import numpy as np
import pytest

from naturaldiffusion_tpu.ops import (weighted_sum_xla,
                                      fused_weighted_sum_pallas,
                                      pad_rows, pad_lanes)


def test_weighted_sum_xla_matches_numpy():
    rng = np.random.default_rng(0)
    w = rng.standard_normal(7)
    buf = rng.standard_normal((7, 3, 5))
    got = np.asarray(weighted_sum_xla(jnp.asarray(w), jnp.asarray(buf),
                                      accum_dtype=jnp.float64))
    want = np.tensordot(w, buf, axes=(0, 0))
    np.testing.assert_allclose(got, want, atol=1e-12)


@pytest.mark.parametrize("live_x,live_e", [(1, 2), (5, 6), (16, 17), (24, 24)])
def test_pallas_fused_matches_xla(live_x, live_e):
    rng = np.random.default_rng(1)
    nx, ne, m = 24, 32, 256
    wx = np.zeros(nx); wx[:live_x] = rng.standard_normal(live_x)
    we = np.zeros(ne); we[:live_e] = rng.standard_normal(live_e)
    bufx = rng.standard_normal((nx, m)).astype(np.float32)
    bufe = rng.standard_normal((ne, m)).astype(np.float32)

    got = np.asarray(fused_weighted_sum_pallas(
        jnp.asarray(wx, jnp.float32), jnp.asarray(we, jnp.float32),
        jnp.asarray(bufx), jnp.asarray(bufe),
        live_x, live_e, tile=128, interpret=True))
    want = wx.astype(np.float32) @ bufx + we.astype(np.float32) @ bufe
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pallas_skips_dead_rows():
    """Rows beyond the live prefix must not contribute even if nonzero."""
    rng = np.random.default_rng(2)
    nx, ne, m = 16, 16, 128
    wx = rng.standard_normal(nx).astype(np.float32)   # nonzero EVERYWHERE
    we = rng.standard_normal(ne).astype(np.float32)
    bufx = rng.standard_normal((nx, m)).astype(np.float32)
    bufe = rng.standard_normal((ne, m)).astype(np.float32)
    live_x, live_e = 8, 8

    got = np.asarray(fused_weighted_sum_pallas(
        jnp.asarray(wx), jnp.asarray(we), jnp.asarray(bufx),
        jnp.asarray(bufe), live_x, live_e, tile=128, interpret=True))
    want = wx[:live_x] @ bufx[:live_x] + we[:live_e] @ bufe[:live_e]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_padding_helpers():
    assert pad_rows(1) == 8 and pad_rows(8) == 8 and pad_rows(9) == 16
    assert pad_lanes(1) == 128 and pad_lanes(129) == 256
