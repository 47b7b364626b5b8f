"""DEIS execution samplers: t-AB == NI matrix (exact), and all methods
converge to the same probability-flow solution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from naturaldiffusion_tpu.coeffs import registry
from naturaldiffusion_tpu.engine import NISchedule, natural_inference
from naturaldiffusion_tpu.schedules import LinearVPSDE
from naturaldiffusion_tpu.samplers import deis

SHAPE = (2, 8)


def toy_x0(x, t):
    return jnp.tanh(x) * 0.5


@pytest.fixture(scope="module")
def sde():
    return LinearVPSDE()


@pytest.fixture(scope="module")
def eps_fn(sde):
    def eps(x, t):
        a, s = sde.marginal_coeff(np.float64(1.0)), None   # placeholder
        alpha = jnp.exp(jnp.asarray(sde.log_alpha(t)))
        sigma = jnp.sqrt(1.0 - alpha ** 2)
        return (x - alpha * toy_x0(x, t)) / sigma
    return eps


@pytest.fixture(scope="module")
def init():
    return jnp.asarray(
        np.random.default_rng(0).standard_normal(SHAPE), jnp.float64)


def test_t_ab_equals_ni_matrix(sde, eps_fn, init):
    n = 12
    sampler = deis.get_sampler_t_ab(sde, eps_fn, "t", 2.0, n, ab_order=3)
    direct = np.asarray(sampler(init))

    m = registry.derive("deis_tab", n)
    sched = NISchedule.from_matrix(m, dtype=jnp.float64)
    ni = np.asarray(natural_inference(toy_x0, sched, init,
                                      prediction_type="x0",
                                      accum_dtype=jnp.float64))
    np.testing.assert_allclose(direct, ni, atol=1e-8)


@pytest.fixture(scope="module")
def ref_solution(sde, eps_fn, init):
    """Tightly-resolved t-AB as the common oracle."""
    return np.asarray(deis.get_sampler_t_ab(sde, eps_fn, "t", 2.0, 200,
                                            ab_order=3)(init))


@pytest.mark.parametrize("method,kwargs", [
    ("t_ab", dict(ab_order=2)),
    ("rho_ab", dict(ab_order=3)),
    ("rho_rk", dict(rk_method="3kutta")),
    ("rho_rk", dict(rk_method="4rk")),
    ("rho_rk", dict(rk_method="2heun")),
    ("ipndm", dict()),
])
def test_all_methods_converge(sde, eps_fn, init, ref_solution, method,
                              kwargs):
    if method == "ipndm":
        sampler = deis.get_sampler_ipndm(sde, eps_fn, 48)
    else:
        sampler = deis.get_sampler(sde, eps_fn, "t", 2.0, 48, method=method,
                                   **kwargs)
    out = np.asarray(sampler(init))
    assert np.isfinite(out).all()
    # ipndm is pinned to a uniform-t grid (ts_order=1), so it converges
    # slower near t0 than the quadratic-grid methods
    tol = 0.1 if method == "ipndm" else 1e-2
    assert np.abs(out - ref_solution).max() < tol, \
        (method, kwargs, np.abs(out - ref_solution).max())


def test_rk_order_improves(sde, eps_fn, init, ref_solution):
    errs = {}
    for mth in ("1euler", "2heun", "3kutta"):
        out = np.asarray(deis.get_sampler_rho_rk(
            sde, eps_fn, "t", 2.0, 24, rk_method=mth)(init))
        errs[mth] = np.abs(out - ref_solution).max()
    assert errs["3kutta"] < errs["2heun"] < errs["1euler"], errs


def test_samplers_jit(sde, eps_fn, init):
    """The scan-based samplers must compile to one executable."""
    sampler = jax.jit(deis.get_sampler_t_ab(sde, eps_fn, "t", 2.0, 10))
    out = sampler(init.astype(jnp.float32))
    assert np.isfinite(np.asarray(out)).all()
