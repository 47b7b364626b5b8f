"""Reverse-diffusion equivalent-coefficient check, cosine schedule, IS."""

import jax.numpy as jnp
import numpy as np

from naturaldiffusion_tpu.coeffs.reverse_diffusion import (
    sde_equivalent_coeff, ode_equivalent_coeff)
from naturaldiffusion_tpu.samplers.dpm_solver import NoiseScheduleVP
from naturaldiffusion_tpu.eval.fid import inception_score


def test_sde_equivalent_coeff_matches_ideal():
    """The paper-appendix identity: reverse-diffusion coefficients telescope
    to the ideal marginals (loose at small start where the discretization is
    coarse, tight elsewhere — same behaviour the reference prints)."""
    rows = sde_equivalent_coeff(stride=100)
    for start, ps, pn, ts, tn in rows[1:]:
        assert abs(ps - ts) < 0.02, (start, ps, ts)
        assert abs(pn - tn) < 0.02, (start, pn, tn)


def test_ode_equivalent_coeff_matches_ideal():
    rows = ode_equivalent_coeff(stride=100)
    for start, ps, pn, ts, tn in rows[1:]:
        assert abs(ps - ts) < 0.02, (start, ps, ts)
        assert abs(pn - tn) < 0.02, (start, pn, tn)


def test_cosine_schedule_roundtrip():
    ns = NoiseScheduleVP(schedule="cosine")
    assert abs(ns.T - 0.9946) < 1e-9
    t = jnp.linspace(1e-3, ns.T, 9)
    lam = ns.marginal_lambda(t)
    back = ns.inverse_lambda(lam)
    np.testing.assert_allclose(np.asarray(back), np.asarray(t), atol=1e-6)
    # alpha(0) == 1, monotone decreasing
    a = np.asarray(ns.marginal_alpha(t))
    assert a[0] > 0.99 and np.all(np.diff(a) < 0)


def test_inception_score_bounds():
    rng = np.random.default_rng(0)
    # uniform predictions -> IS == 1
    probs = np.full((100, 10), 0.1)
    m, s = inception_score(probs, splits=5)
    np.testing.assert_allclose(m, 1.0, atol=1e-6)
    # confident diverse predictions -> IS ~ num_classes
    onehot = np.eye(10)[rng.integers(0, 10, 1000)] * 0.999 + 1e-4
    m2, _ = inception_score(onehot, splits=5)
    assert m2 > 8.0, m2
