"""PC sampler framework, RK45, likelihood, controllable generation.

Oracles are analytic: for data concentrated at x0=0, the VP marginal is
N(0, sigma_t^2) and the exact score is -x/sigma_t^2; for data ~ N(0, I) the
VP marginal is N(0, I) at every t and the probability-flow drift is zero.
"""

import jax
import jax.numpy as jnp
import numpy as np

from naturaldiffusion_tpu.sde import VPSDE, VESDE
from naturaldiffusion_tpu.samplers.pc import (get_pc_sampler,
                                              get_ode_sampler)
from naturaldiffusion_tpu.samplers.rk45 import rk45_integrate
from naturaldiffusion_tpu.samplers.controllable import (get_pc_inpainter,
                                                        get_pc_colorizer,
                                                        decouple, couple)
from naturaldiffusion_tpu.eval.likelihood import get_likelihood_fn

SHAPE = (4, 4, 4, 1)


def delta_score(x, t):
    """Exact score for data = delta(0) under VP."""
    sde = VPSDE()
    _, std = sde.marginal_prob(jnp.zeros_like(x), t)
    return -x / std.reshape(-1, 1, 1, 1) ** 2


def gauss_score(x, t):
    """Exact score for data ~ N(0, I) under VP (marginal is N(0, I))."""
    return -x


def test_rk45_linear_ode():
    y0 = jnp.ones((3,)) * 2.0
    y, nfe = rk45_integrate(lambda y, t: -y, y0, 0.0, 1.0,
                            rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(y), 2.0 * np.exp(-1.0), rtol=1e-6)
    assert nfe > 6


def test_rk45_reverse_time():
    y0 = jnp.ones((2,))
    y, _ = rk45_integrate(lambda y, t: y * 0 + t, y0, 1.0, 0.0,
                          rtol=1e-8, atol=1e-8)
    # integral of t from 1 to 0 = -0.5
    np.testing.assert_allclose(np.asarray(y), 0.5, rtol=1e-6)


def test_pc_sampler_contracts_to_data():
    sde = VPSDE(N=200)
    for pred, corr in [("euler_maruyama", "none"),
                       ("reverse_diffusion", "none"),
                       ("ancestral_sampling", "none"),
                       ("reverse_diffusion", "langevin")]:
        sampler = jax.jit(get_pc_sampler(sde, delta_score, SHAPE,
                                         predictor=pred, corrector=corr))
        x, nfe = sampler(jax.random.PRNGKey(0))
        x = np.asarray(x)
        assert np.isfinite(x).all(), (pred, corr)
        # EM at N=200 carries more discretization variance than the others
        assert np.abs(x).mean() < 0.25, (pred, corr, np.abs(x).mean())


def test_pc_sampler_ve_ancestral():
    sde = VESDE(N=200)

    def ve_score(x, t):
        std = sde.marginal_prob(jnp.zeros_like(x), t)[1]
        return -x / std.reshape(-1, 1, 1, 1) ** 2

    sampler = jax.jit(get_pc_sampler(sde, ve_score, SHAPE,
                                     predictor="ancestral_sampling"))
    x, _ = sampler(jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(x)).all()
    assert np.abs(np.asarray(x)).mean() < 0.2


def test_ode_sampler_identity_flow():
    """With N(0,I) data the probability-flow drift vanishes: z == prior."""
    sde = VPSDE()
    sampler = get_ode_sampler(sde, gauss_score, SHAPE)
    key = jax.random.PRNGKey(1)
    x, nfe = sampler(key)
    # prior sample with the same key path
    _, sub = jax.random.split(key)
    want = jax.random.normal(sub, SHAPE)
    np.testing.assert_allclose(np.asarray(x), np.asarray(want), atol=1e-3)


def test_likelihood_gaussian_bpd():
    """Dequantization offset convention (reference likelihood.py:100-104,
    ``offset = 7 - inverse_scaler(-1)``): 7 for centered data, 8 for
    uncentered."""
    sde = VPSDE()
    data = jax.random.normal(jax.random.PRNGKey(2), SHAPE)
    nll_bits = (np.log(2 * np.pi) / 2
                + (np.asarray(data) ** 2).mean() / 2) / np.log(2)

    # centered data ([-1,1] model space): inverse_scaler=(x+1)/2 -> offset 7
    lik = get_likelihood_fn(sde, gauss_score, eps=1e-5,
                            inverse_scaler=lambda x: (x + 1.0) / 2.0)
    bpd, z, nfe = lik(jax.random.PRNGKey(3), data)
    np.testing.assert_allclose(np.asarray(z), np.asarray(data), atol=1e-3)
    np.testing.assert_allclose(np.asarray(bpd).mean(), nll_bits + 7.0,
                               rtol=1e-3)

    # uncentered ([0,1] model space): identity inverse_scaler -> offset 8
    lik8 = get_likelihood_fn(sde, gauss_score, eps=1e-5)
    bpd8, _, _ = lik8(jax.random.PRNGKey(3), data)
    np.testing.assert_allclose(np.asarray(bpd8).mean(), nll_bits + 8.0,
                               rtol=1e-3)


def test_inpainter_preserves_known():
    sde = VPSDE(N=200)
    data = jnp.zeros(SHAPE)
    mask = jnp.zeros(SHAPE).at[:, :2].set(1.0)
    # eps=1e-3: the analytic delta-score is stiff (score ~ x/(beta0*t)),
    # unlike a trained net; the reference default 1e-5 assumes N=1000
    inpaint = jax.jit(get_pc_inpainter(sde, delta_score, corrector="none",
                                       eps=1e-3))
    out = np.asarray(inpaint(jax.random.PRNGKey(4), data, mask))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[:, :2], 0.0, atol=1e-2)   # known region
    assert np.abs(out).mean() < 0.1                           # delta target


def test_colorizer_preserves_gray():
    sde = VPSDE(N=100)
    shape = (2, 4, 4, 3)

    def score3(x, t):
        std = sde.marginal_prob(jnp.zeros_like(x), t)[1]
        return -x / std.reshape(-1, 1, 1, 1) ** 2

    gray = jnp.zeros(shape)
    colorize = jax.jit(get_pc_colorizer(sde, score3, corrector="none",
                                        eps=1e-3))
    out = np.asarray(colorize(jax.random.PRNGKey(5), gray))
    assert out.shape == shape and np.isfinite(out).all()
    # the decoupled gray channel must match the input's
    g_out = np.asarray(decouple(jnp.asarray(out)))[..., 0]
    np.testing.assert_allclose(g_out, 0.0, atol=2e-2)


def test_couple_decouple_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 4, 4, 3))
    np.testing.assert_allclose(np.asarray(couple(decouple(x))),
                               np.asarray(x), atol=1e-5)
