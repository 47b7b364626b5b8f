"""SDE library (jax): VP, sub-VP, VE — forward/reverse dynamics.

TPU-native rebuild of ``deps/score_sde_pytorch/sde_lib.py:7-254``.  All
methods are jnp-traced (usable inside jit/grad/vmap); the numpy twin used for
host-side coefficient derivation lives in
:mod:`naturaldiffusion_tpu.schedules` (``LinearVPSDE``).
"""

from __future__ import annotations

import abc
import dataclasses
import math

import jax
import jax.numpy as jnp


class SDE(abc.ABC):
    """dx = f(x,t) dt + g(t) dw on t in [0, T]."""

    N: int
    T: float = 1.0

    @abc.abstractmethod
    def sde(self, x, t) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(drift, diffusion)."""

    @abc.abstractmethod
    def marginal_prob(self, x, t) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(mean, std) of p_t(x(t) | x(0))."""

    @abc.abstractmethod
    def prior_sampling(self, key, shape) -> jnp.ndarray: ...

    @abc.abstractmethod
    def prior_logp(self, z) -> jnp.ndarray: ...

    def discretize(self, x, t) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Euler-Maruyama one-step coefficients (f_i, G_i) so that
        x_{i+1} = x_i + f_i + G_i z  (reference ``sde_lib.py:80-95``)."""
        dt = 1.0 / self.N
        drift, diffusion = self.sde(x, t)
        return drift * dt, diffusion * math.sqrt(dt)

    def reverse(self, score_fn, probability_flow: bool = False):
        """Reverse-time SDE/ODE (reference ``sde_lib.py:97-109``)."""
        fwd_sde, fwd_disc = self.sde, self.discretize
        N, T = self.N, self.T

        class RSDE:
            def sde(self, x, t):
                drift, diffusion = fwd_sde(x, t)
                score = score_fn(x, t)
                factor = 0.5 if probability_flow else 1.0
                drift = drift - _bcast(jnp.atleast_1d(diffusion) ** 2,
                                       x) * score * factor
                diffusion = jnp.zeros_like(diffusion) if probability_flow \
                    else diffusion
                return drift, diffusion

            def discretize(self, x, t):
                f, G = fwd_disc(x, t)
                factor = 0.5 if probability_flow else 1.0
                rev_f = f - _bcast(jnp.atleast_1d(G) ** 2, x) \
                    * score_fn(x, t) * factor
                rev_G = jnp.zeros_like(G) if probability_flow else G
                return rev_f, rev_G

        RSDE.N, RSDE.T = N, T
        return RSDE()


def _bcast(a, x):
    """Broadcast per-batch scalar ``a`` over the trailing dims of ``x``."""
    return a.reshape(a.shape + (1,) * (x.ndim - a.ndim))


@dataclasses.dataclass(frozen=True)
class VPSDE(SDE):
    """dx = -1/2 beta(t) x dt + sqrt(beta(t)) dw (``sde_lib.py:112-164``)."""
    beta_min: float = 0.1
    beta_max: float = 20.0
    N: int = 1000

    def beta(self, t):
        return self.beta_min + t * (self.beta_max - self.beta_min)

    def sde(self, x, t):
        beta_t = self.beta(t)
        return -0.5 * _bcast(beta_t, x) * x, jnp.sqrt(beta_t)

    def log_mean_coeff(self, t):
        return (-0.25 * t ** 2 * (self.beta_max - self.beta_min)
                - 0.5 * t * self.beta_min)

    def marginal_prob(self, x, t):
        lmc = self.log_mean_coeff(t)
        return _bcast(jnp.exp(lmc), x) * x, jnp.sqrt(1.0 - jnp.exp(2.0 * lmc))

    def prior_sampling(self, key, shape):
        return jax.random.normal(key, shape)

    def prior_logp(self, z):
        d = math.prod(z.shape[1:])
        return (-d / 2.0 * math.log(2 * math.pi)
                - jnp.sum(z.reshape(z.shape[0], -1) ** 2, -1) / 2.0)

    def discretize(self, x, t):
        """Exact DDPM discretization (``sde_lib.py:148-164``)."""
        idx = (t * (self.N - 1) / self.T).astype(jnp.int32)
        betas = jnp.linspace(self.beta_min / self.N, self.beta_max / self.N,
                             self.N)
        beta = betas[idx]
        alpha = 1.0 - beta
        f = _bcast(jnp.sqrt(alpha), x) * x - x
        return f, jnp.sqrt(beta)


@dataclasses.dataclass(frozen=True)
class SubVPSDE(SDE):
    """VP drift with shrunken diffusion (``sde_lib.py:167-204``)."""
    beta_min: float = 0.1
    beta_max: float = 20.0
    N: int = 1000

    def sde(self, x, t):
        beta_t = self.beta_min + t * (self.beta_max - self.beta_min)
        discount = 1.0 - jnp.exp(-2.0 * self.beta_min * t
                                 - (self.beta_max - self.beta_min) * t ** 2)
        return -0.5 * _bcast(beta_t, x) * x, jnp.sqrt(beta_t * discount)

    def marginal_prob(self, x, t):
        lmc = (-0.25 * t ** 2 * (self.beta_max - self.beta_min)
               - 0.5 * t * self.beta_min)
        mean = _bcast(jnp.exp(lmc), x) * x
        return mean, 1.0 - jnp.exp(2.0 * lmc)

    def prior_sampling(self, key, shape):
        return jax.random.normal(key, shape)

    def prior_logp(self, z):
        d = math.prod(z.shape[1:])
        return (-d / 2.0 * math.log(2 * math.pi)
                - jnp.sum(z.reshape(z.shape[0], -1) ** 2, -1) / 2.0)


@dataclasses.dataclass(frozen=True)
class VESDE(SDE):
    """dx = sigma_min (sigma_max/sigma_min)^t sqrt(2 log(smax/smin)) dw
    (``sde_lib.py:207-254``)."""
    sigma_min: float = 0.01
    sigma_max: float = 50.0
    N: int = 1000

    def sigma(self, t):
        return self.sigma_min * (self.sigma_max / self.sigma_min) ** t

    def sde(self, x, t):
        sigma = self.sigma(t)
        diffusion = sigma * jnp.sqrt(
            2.0 * (math.log(self.sigma_max) - math.log(self.sigma_min)))
        return jnp.zeros_like(x), diffusion

    def marginal_prob(self, x, t):
        return x, self.sigma(t)

    def prior_sampling(self, key, shape):
        return jax.random.normal(key, shape) * self.sigma_max

    def prior_logp(self, z):
        d = math.prod(z.shape[1:])
        return (-d / 2.0 * math.log(2 * math.pi * self.sigma_max ** 2)
                - jnp.sum(z.reshape(z.shape[0], -1) ** 2, -1)
                / (2.0 * self.sigma_max ** 2))

    def discretize(self, x, t):
        """SMLD ancestral discretization (``sde_lib.py:245-254``)."""
        idx = (t * (self.N - 1) / self.T).astype(jnp.int32)
        sigmas = jnp.exp(jnp.linspace(math.log(self.sigma_min),
                                      math.log(self.sigma_max), self.N))
        sigma = sigmas[idx]
        adj = jnp.where(idx == 0, jnp.zeros_like(sigma), sigmas[idx - 1])
        return jnp.zeros_like(x), jnp.sqrt(sigma ** 2 - adj ** 2)


def get_score_fn(sde: SDE, apply_fn, *, continuous: bool = True):
    """Wrap a (x, t_label) denoiser into score(x, t) — the label conventions
    of ``deps/score_sde_pytorch/models/utils.py:129-180``:

    * VP continuous: label = t * 999, score = -eps / std
    * VP discrete:   label = t * (N-1), score = -eps / sqrt(1-abar[label])
    * VE continuous: label = marginal std; model output IS the score
    """
    if isinstance(sde, (VPSDE, SubVPSDE)):
        if continuous:
            def score_fn(x, t):
                labels = t * 999
                eps = apply_fn(x, labels)
                _, std = sde.marginal_prob(jnp.zeros_like(x), t)
                return -eps / _bcast(std, x)
        else:
            def score_fn(x, t):
                labels = t * (sde.N - 1)
                eps = apply_fn(x, labels)
                betas = jnp.linspace(sde.beta_min / sde.N,
                                     sde.beta_max / sde.N, sde.N)
                abar = jnp.cumprod(1.0 - betas)
                std = jnp.sqrt(1.0 - abar[labels.astype(jnp.int32)])
                return -eps / _bcast(std, x)
        return score_fn
    if isinstance(sde, VESDE):
        def score_fn(x, t):
            if continuous:
                labels = sde.marginal_prob(jnp.zeros_like(x), t)[1]
            else:
                # reference models/utils.py:168-171 rounds before the model's
                # integer cast; without it, truncation indexes sigma[i-1].
                labels = jnp.round((sde.T - t) * (sde.N - 1))
            return apply_fn(x, labels)
        return score_fn
    raise NotImplementedError(type(sde))
