import numpy as np
import pytest

from naturaldiffusion_tpu.affine import Affine, AffineTracker
from naturaldiffusion_tpu.schedules import (DiscreteVP, LinearVPSDE,
                                            deis_rev_ts, space_timesteps)


def test_affine_arithmetic():
    a, b = Affine.symbol("a"), Affine.symbol("b")
    e = 2.0 * a - b / 4.0 + a
    assert e.coeff("a") == 3.0
    assert e.coeff("b") == -0.25
    assert (-e).coeff("a") == -3.0
    assert (e + Affine.zero()).coeff("a") == 3.0
    assert (0 + e).coeff("b") == -0.25


def test_affine_rejects_constant_offset():
    with pytest.raises(ValueError):
        Affine.symbol("a") + 1.0


def test_tracker_ordering():
    tr = AffineTracker()
    tr.new_eps("t0")
    y1, y2 = tr.new_y("n1"), tr.new_y("n2")
    tr.new_eps("t1")
    assert tr.y_names == ["y_n1", "y_n2"]
    assert tr.eps_names == ["eps_t0", "eps_t1"]
    row = tr.coeff_row(3 * y2 - y1, tr.y_names)
    np.testing.assert_array_equal(row, [-1.0, 3.0])


def test_space_timesteps_ddim_stride():
    assert space_timesteps(1000, "ddim10") == set(range(0, 1000, 100))
    s = space_timesteps(1000, "18")
    assert len(s) == 18 and min(s) == 0 and max(s) == 999


def test_discrete_vp_respacing_consistency():
    full = DiscreteVP.create()
    assert full.alphas_bar.shape == (1000,)
    sub = DiscreteVP.create(10)
    # respaced per-step alphas multiply back to the marginal alphas_bar
    np.testing.assert_allclose(np.cumprod(sub.alphas), sub.alphas_bar, rtol=1e-12)


def test_lambda_roundtrip():
    sde = LinearVPSDE()
    t = np.linspace(1e-3, 1.0, 50)
    np.testing.assert_allclose(sde.inverse_lam(sde.lam(t)), t, rtol=1e-10)
    np.testing.assert_allclose(sde.alpha2t(sde.t2alpha(t)), t, rtol=1e-8)
    np.testing.assert_allclose(sde.rho2t(sde.t2rho(t)), t, rtol=1e-7)


def test_deis_grids_monotone():
    sde = LinearVPSDE()
    for phase in ("t", "log", "rho"):
        ts = deis_rev_ts(sde, 10, 2.0, phase)
        assert ts.shape == (11,)
        assert np.all(np.diff(ts) < 0), phase
        assert abs(ts[0] - 1.0) < 1e-6 and abs(ts[-1] - 1e-3) < 1e-6
