"""PiecewiseVPSDE (discrete-alpha DEIS process) vs the continuous twin."""

import jax.numpy as jnp
import numpy as np

from naturaldiffusion_tpu.schedules import LinearVPSDE, PiecewiseVPSDE
from naturaldiffusion_tpu.samplers import deis


def _discrete_from_linear(n=1000):
    betas = np.linspace(0.1 / n, 20.0 / n, n)
    return PiecewiseVPSDE.from_betas(betas)


def test_tables_track_continuous():
    d = _discrete_from_linear()
    c = LinearVPSDE()
    t_cont = np.linspace(0.05, 0.95, 7)
    t_disc = t_cont * 1000 - 1          # index convention ~ t*N
    np.testing.assert_allclose(d.t2alpha(t_disc), c.t2alpha(t_cont),
                               rtol=2e-2, atol=1e-4)
    # roundtrips
    t = np.linspace(10, 990, 9)
    np.testing.assert_allclose(d.alpha2t(d.t2alpha(t)), t, atol=0.51)
    np.testing.assert_allclose(d.rho2t(d.t2rho(t)), t, atol=0.51)


def test_deis_tab_runs_on_discrete_schedule():
    """The reference's FID sweep builds DEIS on DiscreteVPSDE from the model
    alphas (src/CIFAR10NaturalInference.py:122-160); same here."""
    d = _discrete_from_linear()
    c = LinearVPSDE()

    def eps_disc(x, t_idx):          # model sees integer-ish timesteps
        t_cont = (t_idx + 1) / 1000.0
        alpha = jnp.exp(jnp.asarray(c.log_alpha(t_cont)))
        sigma = jnp.sqrt(1 - alpha ** 2)
        return (x - alpha * jnp.tanh(x) * 0.5) / sigma

    def eps_cont(x, t):
        alpha = jnp.exp(jnp.asarray(c.log_alpha(t)))
        sigma = jnp.sqrt(1 - alpha ** 2)
        return (x - alpha * jnp.tanh(x) * 0.5) / sigma

    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8)))
    out_d = deis.get_sampler_t_ab(d, eps_disc, "t", 2.0, 20, ab_order=3,
                                  t0=0.0)(x)
    out_c = deis.get_sampler_t_ab(c, eps_cont, "t", 2.0, 20, ab_order=3,
                                  t0=1e-3)(x)
    assert np.isfinite(np.asarray(out_d)).all()
    # same underlying process, two parameterisations -> close trajectories
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_c),
                               atol=5e-2)
