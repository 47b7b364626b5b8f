"""Predictor-Corrector sampling framework.

Rebuild of ``deps/score_sde_pytorch/sampling.py:34-485``: predictor and
corrector registries, the PC sampler loop, and the probability-flow ODE
sampler.  TPU-native shape: the time loop is ``lax.scan`` over precomputed
timesteps; predictors/correctors are pure ``(x, t, key) -> (x, x_mean)``
functions closed over the SDE + score_fn, so one jitted executable covers
every (predictor, corrector) combination the reference registers.
"""

from __future__ import annotations

import functools
import math
from typing import Callable

import jax
import jax.numpy as jnp

from ..sde import SDE, VPSDE, VESDE, _bcast

_PREDICTORS: dict[str, Callable] = {}
_CORRECTORS: dict[str, Callable] = {}


def register_predictor(name):
    def deco(fn):
        _PREDICTORS[name] = fn
        return fn
    return deco


def register_corrector(name):
    def deco(fn):
        _CORRECTORS[name] = fn
        return fn
    return deco


def get_predictor(name: str):
    return _PREDICTORS[name]


def get_corrector(name: str):
    return _CORRECTORS[name]


# -- predictors (reference sampling.py:176-250) ------------------------------


@register_predictor("euler_maruyama")
def euler_maruyama(sde: SDE, score_fn, x, t, key):
    dt = -1.0 / sde.N
    z = jax.random.normal(key, x.shape)
    rsde = sde.reverse(score_fn)
    drift, diffusion = rsde.sde(x, t)
    x_mean = x + drift * dt
    x = x_mean + _bcast(jnp.atleast_1d(diffusion), x) * math.sqrt(-dt) * z
    return x, x_mean


@register_predictor("reverse_diffusion")
def reverse_diffusion(sde: SDE, score_fn, x, t, key):
    rsde = sde.reverse(score_fn)
    f, G = rsde.discretize(x, t)
    z = jax.random.normal(key, x.shape)
    x_mean = x - f
    x = x_mean + _bcast(jnp.atleast_1d(G), x) * z
    return x, x_mean


@register_predictor("ancestral_sampling")
def ancestral_sampling(sde: SDE, score_fn, x, t, key):
    """DDPM/SMLD ancestral step (reference ``sampling.py:203-239``)."""
    if isinstance(sde, VPSDE):
        idx = (t * (sde.N - 1) / sde.T).astype(jnp.int32)
        betas = jnp.linspace(sde.beta_min / sde.N, sde.beta_max / sde.N,
                             sde.N)
        beta = betas[idx]
        score = score_fn(x, t)
        x_mean = (x + _bcast(beta, x) * score) / jnp.sqrt(1.0 - _bcast(beta, x))
        z = jax.random.normal(key, x.shape)
        return x_mean + _bcast(jnp.sqrt(beta), x) * z, x_mean
    if isinstance(sde, VESDE):
        idx = (t * (sde.N - 1) / sde.T).astype(jnp.int32)
        sigmas = jnp.exp(jnp.linspace(math.log(sde.sigma_min),
                                      math.log(sde.sigma_max), sde.N))
        sigma = sigmas[idx]
        adj = jnp.where(idx == 0, jnp.zeros_like(sigma), sigmas[idx - 1])
        score = score_fn(x, t)
        x_mean = x + score * _bcast(sigma ** 2 - adj ** 2, x)
        std = jnp.sqrt(adj ** 2 * (sigma ** 2 - adj ** 2) / sigma ** 2)
        z = jax.random.normal(key, x.shape)
        return x_mean + _bcast(std, x) * z, x_mean
    raise NotImplementedError(type(sde))


@register_predictor("none")
def none_predictor(sde, score_fn, x, t, key):
    return x, x


# -- correctors (reference sampling.py:253-330) ------------------------------


@register_corrector("langevin")
def langevin(sde: SDE, score_fn, x, t, key, *, snr: float, n_steps: int):
    if isinstance(sde, VPSDE):
        idx = (t * (sde.N - 1) / sde.T).astype(jnp.int32)
        betas = jnp.linspace(sde.beta_min / sde.N, sde.beta_max / sde.N,
                             sde.N)
        alpha = 1.0 - betas[idx]
    else:
        alpha = jnp.ones_like(t)

    def body(i, carry):
        x, key = carry
        key, sub = jax.random.split(key)
        grad = score_fn(x, t)
        noise = jax.random.normal(sub, x.shape)
        gn = jnp.linalg.norm(grad.reshape(grad.shape[0], -1), axis=-1).mean()
        nn_ = jnp.linalg.norm(noise.reshape(noise.shape[0], -1), axis=-1).mean()
        step = (snr * nn_ / gn) ** 2 * 2 * alpha
        x_mean = x + _bcast(step, x) * grad
        x = x_mean + _bcast(jnp.sqrt(step * 2), x) * noise
        return x, key

    x, _ = jax.lax.fori_loop(0, n_steps, body, (x, key))
    return x, x


@register_corrector("ald")
def ald(sde: SDE, score_fn, x, t, key, *, snr: float, n_steps: int):
    """Annealed Langevin (NCSNv2 convention — uses the marginal std, not the
    gradient norm; reference ``sampling.py:285-322``)."""
    if isinstance(sde, VPSDE):
        idx = (t * (sde.N - 1) / sde.T).astype(jnp.int32)
        betas = jnp.linspace(sde.beta_min / sde.N, sde.beta_max / sde.N,
                             sde.N)
        alpha = 1.0 - betas[idx]
    else:
        alpha = jnp.ones_like(t)
    std = sde.marginal_prob(x, t)[1]

    def body(i, carry):
        x, key = carry
        key, sub = jax.random.split(key)
        grad = score_fn(x, t)
        noise = jax.random.normal(sub, x.shape)
        step = (snr * std) ** 2 * 2 * alpha
        x_mean = x + _bcast(step, x) * grad
        x = x_mean + _bcast(jnp.sqrt(step * 2), x) * noise
        return x, key

    x, _ = jax.lax.fori_loop(0, n_steps, body, (x, key))
    return x, x


@register_corrector("none")
def none_corrector(sde, score_fn, x, t, key, *, snr=0.0, n_steps=0):
    return x, x


# -- PC sampler (reference sampling.py:355-411) -------------------------------


def get_pc_sampler(sde: SDE, score_fn, shape, *, predictor="reverse_diffusion",
                   corrector="none", snr: float = 0.16, n_steps: int = 1,
                   denoise: bool = True, eps: float = 1e-3):
    """Returns ``sampler(key) -> (x, nfe)``; one jitted scan."""
    pred = get_predictor(predictor)
    corr = functools.partial(get_corrector(corrector), snr=snr,
                             n_steps=n_steps)
    timesteps = jnp.linspace(sde.T, eps, sde.N)

    def sampler(key):
        key, sub = jax.random.split(key)
        x = sde.prior_sampling(sub, shape)

        def step(carry, t):
            x, key = carry
            key, kc, kp = jax.random.split(key, 3)
            tb = jnp.full((shape[0],), t)
            x, x_mean = corr(sde, score_fn, x, tb, kc)
            x, x_mean = pred(sde, score_fn, x, tb, kp)
            return (x, key), x_mean

        (x, _), means = jax.lax.scan(step, (x, key), timesteps)
        out = means[-1] if denoise else x
        nfe = sde.N * (n_steps + 1)
        return out, nfe

    return sampler


# -- probability-flow ODE sampler (reference sampling.py:414-485) -------------


def get_ode_sampler(sde: SDE, score_fn, shape, *, rtol: float = 1e-5,
                    atol: float = 1e-5, eps: float = 1e-3,
                    denoise: bool = False):
    """Black-box RK45 over the probability-flow ODE.

    The reference calls scipy ``solve_ivp(RK45)`` on host; here the adaptive
    RK45 loop is a jitted ``lax.while_loop`` (Dormand-Prince 5(4)), keeping
    the whole trajectory on device."""
    from .rk45 import rk45_integrate

    rsde = sde.reverse(score_fn, probability_flow=True)

    def ode_fn(x, t):
        tb = jnp.full((shape[0],), t)
        return rsde.sde(x, tb)[0]

    def sampler(key, x_init=None):
        if x_init is None:
            key, sub = jax.random.split(key)
            x_init = sde.prior_sampling(sub, shape)
        x, nfe = rk45_integrate(ode_fn, x_init, sde.T, eps, rtol=rtol,
                                atol=atol)
        if denoise:
            # one reverse-diffusion denoising step at eps (sampling.py:443)
            tb = jnp.full((shape[0],), eps)
            f, G = sde.reverse(score_fn).discretize(x, tb)
            x = x - f
            nfe = nfe + 1
        return x, nfe

    return sampler
