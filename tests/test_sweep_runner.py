"""The sweep's shared-executable runner (VERDICT r3 task 4 redesign).

``apps/sweep.py::_make_runner`` passes DEIS coefficient tables as runtime
arguments and caches the jitted wrapper by ``sampler.structure`` so grid
cells of one structure share ONE compiled executable (the r3 sweep paid a
multi-minute tunnel compile per cell).  Sharing is only sound if the
runner's output is bit-identical to the plain closure-constant sampler —
pinned here for every AB family/structure in the grid.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from naturaldiffusion_tpu.schedules import LinearVPSDE
from naturaldiffusion_tpu.samplers import deis as deis_mod
from naturaldiffusion_tpu.apps.sweep import _make_runner


@pytest.fixture(scope="module")
def setup():
    sde = LinearVPSDE()

    def eps_fn(x, t):
        return jnp.tanh(x) * (0.1 + 0.01 * t)

    x = jax.random.normal(jax.random.PRNGKey(0), (8, 4, 4, 3), jnp.float32)
    return sde, eps_fn, x


def test_runner_matches_plain_sampler_and_shares_structures(setup):
    sde, eps_fn, x = setup
    cache = {}
    makers = [
        ("t_ab o3 t", lambda: deis_mod.get_sampler(
            sde, eps_fn, "t", 2.0, 6, method="t_ab", ab_order=3)),
        ("t_ab o3 rho", lambda: deis_mod.get_sampler(
            sde, eps_fn, "rho", 2.0, 6, method="t_ab", ab_order=3)),
        ("t_ab o1", lambda: deis_mod.get_sampler(
            sde, eps_fn, "t", 2.0, 6, method="t_ab", ab_order=1)),
        ("ipndm", lambda: deis_mod.get_sampler_ipndm(sde, eps_fn, 6)),
        ("rho_ab o2", lambda: deis_mod.get_sampler(
            sde, eps_fn, "t", 2.0, 6, method="rho_ab", ab_order=2)),
        ("rho_ab o2 rho", lambda: deis_mod.get_sampler(
            sde, eps_fn, "rho", 2.0, 6, method="rho_ab", ab_order=2)),
    ]
    for label, mk in makers:
        s = mk()
        plain = np.asarray(s(x))
        shared = np.asarray(_make_runner(s, 0, cache)(x))
        assert np.array_equal(plain, shared), label
    # t_ab o3 (both phases) + ipndm share ONE entry; o1 and rho_ab o2
    # (both phases) get their own
    assert sorted(cache) == [("ab_scan", 1), ("ab_scan", 3), ("rho_ab", 2)]


def test_runner_microbatch_path(setup):
    sde, eps_fn, x = setup
    s = deis_mod.get_sampler(sde, eps_fn, "t", 2.0, 4, method="t_ab",
                             ab_order=2)
    full = np.asarray(_make_runner(s, 0, {})(x))
    micro = np.asarray(_make_runner(s, 4, {})(x))
    np.testing.assert_allclose(micro, full, atol=1e-6)


def test_rho_rk_has_no_shared_structure(setup):
    sde, eps_fn, x = setup
    s = deis_mod.get_sampler(sde, eps_fn, "t", 2.0, 4, method="rho_rk")
    assert not hasattr(s, "run")
    cache = {}
    out = np.asarray(_make_runner(s, 0, cache)(x))
    assert np.isfinite(out).all() and cache == {}
