"""Direct (non-NI) sampler recursions, as jitted ``lax.scan`` loops.

These are the original algorithms that the coefficient matrices are derived
FROM, re-implemented TPU-natively.  They serve two roles (mirroring the
reference):

* equivalence oracles — Natural Inference with the derived matrix must
  reproduce the direct recursion bit-for-bit from the same seed
  (``src/ValidateNaturalInference.py:375-382``);
* FID-sweep baselines (DEIS / DPM-Solver grids in
  ``src/CIFAR10NaturalInference.py:122-238``) — see
  :mod:`naturaldiffusion_tpu.samplers.dpm_solver` and ``.deis``.

All samplers take ``x0_fn(x, t) -> predicted x0`` (use
``engine.predictions`` to adapt eps/score/v networks) and run the *same
host-precomputed float64 per-step coefficients* as the matching deriver in
:mod:`naturaldiffusion_tpu.coeffs`, so equivalence is exact rather than
approximate.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..schedules import DiscreteVP, LinearVPSDE, flow_sigmas


def _scan_sampler(step_fn, x_init, per_step, dtype):
    xs = tuple(jnp.asarray(a, dtype) for a in per_step)
    final, _ = jax.lax.scan(lambda c, s: (step_fn(c, *s), None), x_init, xs)
    return final


# ---------------------------------------------------------------------------
# Discrete DDPM / DDIM (reference: src/ValidateNaturalInference.py:207-308)
# ---------------------------------------------------------------------------


def ddpm_ancestral(x0_fn: Callable, num_step: int, init_noise, noises,
                   dtype=jnp.float32):
    """DDPM ancestral skip-sampling.  ``noises``: [num_step, ...] injected."""
    sch = DiscreteVP.create(num_step)
    ts = sch.timesteps[::-1].astype(np.float64)
    c_xt = sch.ddpm_coeff_xt[::-1]
    c_x0 = sch.ddpm_coeff_x0[::-1]
    std = sch.posterior_std[::-1]

    def step(x, t, cxt, cx0, s, eps):
        y = x0_fn(x, t)
        return cxt * x + cx0 * y + s * eps

    return _scan_sampler(step, jnp.asarray(init_noise, dtype),
                         (ts, c_xt, c_x0, std, jnp.asarray(noises, dtype)),
                         dtype)


def ddim(x0_fn: Callable, num_step: int, init_noise, dtype=jnp.float32):
    """DDIM (eta=0) skip-sampling."""
    sch = DiscreteVP.create(num_step)
    ts = sch.timesteps[::-1].astype(np.float64)
    c_xt = sch.ddim_coeff_xt[::-1]
    c_x0 = sch.ddim_coeff_x0[::-1]

    def step(x, t, cxt, cx0):
        return cxt * x + cx0 * x0_fn(x, t)

    return _scan_sampler(step, jnp.asarray(init_noise, dtype),
                         (ts, c_xt, c_x0), dtype)


# ---------------------------------------------------------------------------
# Continuous VP-SDE Euler / Heun (reference: src/AnalyzeEulerHeun.py:50-292)
# ---------------------------------------------------------------------------


def _vp_grid(num_step: int):
    n = num_step + 1
    eta = 1.0 / n
    dt = (eta - 1.0) / (n - 1)
    return 1.0 + np.arange(n) * dt, dt


def ode_euler(x0_fn: Callable, num_step: int, init_noise, dtype=jnp.float32):
    """Probability-flow ODE, explicit Euler, linear VP-SDE."""
    sde = LinearVPSDE()
    ts, dt = _vp_grid(num_step)
    s = ts[:-1]
    f = -0.5 * sde.beta(s)
    g2 = sde.beta(s)
    alpha, sigma = sde.marginal_coeff(s)

    def step(x, t, f_, g2_, a_, s_):
        y = x0_fn(x, t)
        score = (a_ * y - x) / s_ ** 2
        return x + (f_ * x - 0.5 * g2_ * score) * dt

    return _scan_sampler(step, jnp.asarray(init_noise, dtype),
                         (s, f, g2, alpha, sigma), dtype)


def sde_euler(x0_fn: Callable, num_step: int, init_noise, noises,
              dtype=jnp.float32):
    """Reverse SDE, Euler-Maruyama, linear VP-SDE."""
    sde = LinearVPSDE()
    ts, dt = _vp_grid(num_step)
    s = ts[:-1]
    f = -0.5 * sde.beta(s)
    g2 = sde.beta(s)
    alpha, sigma = sde.marginal_coeff(s)
    nscale = np.sqrt(g2) * np.sqrt(abs(dt))

    def step(x, t, f_, g2_, a_, s_, ns_, eps):
        y = x0_fn(x, t)
        score = (a_ * y - x) / s_ ** 2
        return x + (f_ * x - g2_ * score) * dt + ns_ * eps

    return _scan_sampler(step, jnp.asarray(init_noise, dtype),
                         (s, f, g2, alpha, sigma, nscale,
                          jnp.asarray(noises, dtype)), dtype)


def ode_heun(x0_fn: Callable, num_step: int, init_noise, dtype=jnp.float32):
    """Heun's method on the probability-flow ODE.

    Reproduces the reference's exact discretization, including the
    alpha-at-s / sigma-at-t mix in the corrector stage
    (``src/AnalyzeEulerHeun.py:249``; see ``coeffs/euler_heun.py`` note).
    """
    sde = LinearVPSDE()
    ts, dt = _vp_grid(num_step)
    s, t = ts[:-1], ts[1:]
    f_s, g2_s = -0.5 * sde.beta(s), sde.beta(s)
    f_t, g2_t = -0.5 * sde.beta(t), sde.beta(t)
    alpha_s, sigma_s = sde.marginal_coeff(s)
    _, sigma_t = sde.marginal_coeff(t)

    def step(x, s_, t_, fs_, g2s_, ft_, g2t_, as_, ss_, st_):
        y = x0_fn(x, s_)
        vel_s = fs_ * x - 0.5 * g2s_ * ((as_ * y - x) / ss_ ** 2)
        x_hat = x + vel_s * dt
        y_hat = x0_fn(x_hat, t_)
        vel_t = ft_ * x_hat - 0.5 * g2t_ * ((as_ * y_hat - x_hat) / st_ ** 2)
        return x + 0.5 * (vel_s + vel_t) * dt

    return _scan_sampler(step, jnp.asarray(init_noise, dtype),
                         (s, t, f_s, g2_s, f_t, g2_t, alpha_s, sigma_s,
                          sigma_t), dtype)


# ---------------------------------------------------------------------------
# Rectified-flow Euler (reference: src/AnalyzeFlowMatching.py / SD3 loop)
# ---------------------------------------------------------------------------


def flow_euler(x0_fn: Callable, num_step: int, init_noise, dtype=jnp.float32):
    """Flow-matching Euler: x_t = x_s + (x_s - x0)/s * (t - s), s: 1 -> 0."""
    sig = flow_sigmas(num_step)[::-1]
    s, t = sig[:-1], sig[1:]

    def step(x, s_, t_):
        y = x0_fn(x, s_)
        return x + (x - y) / s_ * (t_ - s_)

    return _scan_sampler(step, jnp.asarray(init_noise, dtype), (s, t), dtype)
