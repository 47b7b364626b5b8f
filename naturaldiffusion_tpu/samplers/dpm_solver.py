"""DPM-Solver / DPM-Solver++ execution engine (jax).

TPU-native rebuild of ``deps/dpm_solver_pytorch.py:6-1305``: NoiseScheduleVP
(discrete + continuous-linear), the 4x3 model/guidance wrapper taxonomy,
singlestep orders 1-3 ('dpmsolver' and 'taylor' variants), multistep orders
1-3 with lower-order warm-up and ``lower_order_final``, the adaptive
DPM-Solver-12/23, dynamic thresholding, ``denoise_to_zero`` and ``inverse``.

Design: time grids and the per-step order plan are host-side numpy (static
under jit); the update chain is pure jnp, so ``sample(...)`` returns from one
compiled executable.  The adaptive solver is a ``lax.while_loop``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def _bc(a, x):
    a = jnp.asarray(a, x.dtype)
    return a.reshape((1,) * x.ndim) if a.ndim == 0 else \
        a.reshape(a.shape + (1,) * (x.ndim - a.ndim))


@dataclasses.dataclass(frozen=True)
class NoiseScheduleVP:
    """lambda = log(alpha) - log(sigma) machinery
    (reference ``deps/dpm_solver_pytorch.py:6-167``).

    ``schedule``: 'linear' / 'cosine' (continuous closed forms) or 'discrete'
    (piecewise-linear interpolation of a trained log-alpha table)."""

    schedule: str = "linear"
    beta_0: float = 0.1
    beta_1: float = 20.0
    cosine_s: float = 0.008            # cosine-schedule shift
    # discrete mode tables (ascending t in [1/N, 1])
    t_array: tuple = ()
    log_alpha_array: tuple = ()
    total_N: int = 1000
    T: float = 1.0

    def __post_init__(self):
        if self.schedule == "cosine":
            # the cosine schedule saturates; cap T as the reference does
            object.__setattr__(self, "T", 0.9946)

    @classmethod
    def discrete(cls, betas=None, alphas_cumprod=None) -> "NoiseScheduleVP":
        if alphas_cumprod is None:
            alphas_cumprod = np.cumprod(1.0 - np.asarray(betas, np.float64))
        log_alphas = 0.5 * np.log(alphas_cumprod)
        n = len(log_alphas)
        t_array = np.linspace(1.0 / n, 1.0, n)
        return cls(schedule="discrete", t_array=tuple(t_array),
                   log_alpha_array=tuple(log_alphas), total_N=n, T=1.0)

    def marginal_log_mean_coeff(self, t):
        if self.schedule == "linear":
            return (-0.25 * t ** 2 * (self.beta_1 - self.beta_0)
                    - 0.5 * t * self.beta_0)
        if self.schedule == "cosine":
            s = self.cosine_s
            log_a0 = math.log(math.cos(s / (1.0 + s) * math.pi / 2.0))
            return jnp.log(jnp.cos((t + s) / (1.0 + s)
                                   * math.pi / 2.0)) - log_a0
        return jnp.interp(t, jnp.asarray(self.t_array),
                          jnp.asarray(self.log_alpha_array))

    def marginal_alpha(self, t):
        return jnp.exp(self.marginal_log_mean_coeff(t))

    def marginal_std(self, t):
        return jnp.sqrt(1.0 - jnp.exp(2.0 * self.marginal_log_mean_coeff(t)))

    def marginal_lambda(self, t):
        la = self.marginal_log_mean_coeff(t)
        return la - 0.5 * jnp.log(1.0 - jnp.exp(2.0 * la))

    # numpy twins for host-side grid planning (inside jit, even constant jnp
    # ops become tracers under jax's stackless tracing)
    def marginal_lambda_np(self, t):
        t = np.asarray(t, np.float64)
        if self.schedule == "linear":
            la = -0.25 * t ** 2 * (self.beta_1 - self.beta_0) \
                - 0.5 * t * self.beta_0
        elif self.schedule == "cosine":
            s = self.cosine_s
            la = np.log(np.cos((t + s) / (1.0 + s) * np.pi / 2.0)) \
                - math.log(math.cos(s / (1.0 + s) * math.pi / 2.0))
        else:
            la = np.interp(t, np.asarray(self.t_array),
                           np.asarray(self.log_alpha_array))
        return la - 0.5 * np.log(1.0 - np.exp(2.0 * la))

    def inverse_lambda_np(self, lam):
        lam = np.asarray(lam, np.float64)
        if self.schedule == "linear":
            tmp = (2.0 * (self.beta_1 - self.beta_0)
                   * np.logaddexp(-2.0 * lam, 0.0))
            delta = self.beta_0 ** 2 + tmp
            return tmp / (np.sqrt(delta) + self.beta_0) \
                / (self.beta_1 - self.beta_0)
        if self.schedule == "cosine":
            s = self.cosine_s
            log_a0 = math.log(math.cos(s / (1.0 + s) * math.pi / 2.0))
            la = -0.5 * np.logaddexp(-2.0 * lam, 0.0)
            return np.arccos(np.exp(la + log_a0)) * 2.0 * (1.0 + s) \
                / np.pi - s
        la = np.asarray(self.log_alpha_array)
        lams = la - 0.5 * np.log(1.0 - np.exp(2.0 * la))
        return np.interp(lam, lams[::-1], np.asarray(self.t_array)[::-1])

    def inverse_lambda(self, lam):
        if self.schedule == "linear":
            tmp = (2.0 * (self.beta_1 - self.beta_0)
                   * jnp.logaddexp(-2.0 * lam, 0.0))
            delta = self.beta_0 ** 2 + tmp
            return tmp / (jnp.sqrt(delta) + self.beta_0) \
                / (self.beta_1 - self.beta_0)
        if self.schedule == "cosine":
            s = self.cosine_s
            log_a0 = math.log(math.cos(s / (1.0 + s) * math.pi / 2.0))
            # lambda -> log_alpha: la = -0.5 * log(exp(-2 lam) + 1)
            la = -0.5 * jnp.logaddexp(-2.0 * lam, 0.0)
            t = (jnp.arccos(jnp.exp(la + log_a0)) * 2.0 * (1.0 + s)
                 / math.pi - s)
            return t
        # discrete: interpolate t as a function of lambda (ascending lambda)
        la = jnp.asarray(self.log_alpha_array)
        lams = la - 0.5 * jnp.log(1.0 - jnp.exp(2.0 * la))
        # lambda decreases with t; reverse for ascending xp
        return jnp.interp(lam, lams[::-1], jnp.asarray(self.t_array)[::-1])


# -- model wrappers (reference :170-335) --------------------------------------


def model_wrapper(model: Callable, ns: NoiseScheduleVP, *,
                  model_type: str = "noise", model_kwargs: dict | None = None,
                  guidance_type: str = "uncond", condition=None,
                  unconditional_condition=None, guidance_scale: float = 1.0,
                  classifier_fn: Callable | None = None,
                  classifier_kwargs: dict | None = None) -> Callable:
    """Wrap any of 4 model parameterisations x 3 guidance types into the
    noise-prediction function ``(x, t_continuous) -> eps`` the solver needs."""
    model_kwargs = model_kwargs or {}
    classifier_kwargs = classifier_kwargs or {}

    def get_model_input_time(t_continuous):
        if ns.schedule == "discrete":
            return (t_continuous - 1.0 / ns.total_N) * 1000.0
        return t_continuous

    def noise_pred_fn(x, t_continuous, cond=None):
        t_input = get_model_input_time(t_continuous)
        out = model(x, t_input, **model_kwargs) if cond is None \
            else model(x, t_input, cond, **model_kwargs)
        if model_type == "noise":
            return out
        if model_type == "x_start":
            alpha_t = ns.marginal_alpha(t_continuous)
            sigma_t = ns.marginal_std(t_continuous)
            return (x - _bc(alpha_t, x) * out) / _bc(sigma_t, x)
        if model_type == "v":
            alpha_t = ns.marginal_alpha(t_continuous)
            sigma_t = ns.marginal_std(t_continuous)
            return _bc(alpha_t, x) * out + _bc(sigma_t, x) * x
        if model_type == "score":
            sigma_t = ns.marginal_std(t_continuous)
            return -_bc(sigma_t, x) * out
        raise ValueError(model_type)

    if guidance_type == "uncond":
        def model_fn(x, t):
            return noise_pred_fn(x, t)
    elif guidance_type == "classifier":
        assert classifier_fn is not None

        def model_fn(x, t):
            t_input = get_model_input_time(t)

            def log_prob(xx):
                return classifier_fn(xx, t_input, condition,
                                     **classifier_kwargs).sum()

            grad = jax.grad(log_prob)(x)
            sigma_t = ns.marginal_std(t)
            noise = noise_pred_fn(x, t)
            return noise - guidance_scale * _bc(sigma_t, x) * grad
    elif guidance_type == "classifier-free":
        def model_fn(x, t):
            if guidance_scale == 1.0 or unconditional_condition is None:
                return noise_pred_fn(x, t, cond=condition)
            x2 = jnp.concatenate([x, x], axis=0)
            t2 = jnp.concatenate([t, t]) if jnp.ndim(t) else t
            c2 = jax.tree.map(
                lambda a, b: jnp.concatenate([a, b], axis=0),
                unconditional_condition, condition)
            noise_uncond, noise = jnp.split(noise_pred_fn(x2, t2, cond=c2),
                                            2, axis=0)
            return noise_uncond + guidance_scale * (noise - noise_uncond)
    else:
        raise ValueError(guidance_type)

    return model_fn


def dynamic_thresholding(x0, *, ratio: float = 0.995, max_val: float = 1.0):
    """Imagen dynamic thresholding (reference ``:416-426``)."""
    s = jnp.quantile(jnp.abs(x0.reshape(x0.shape[0], -1)), ratio, axis=1)
    s = jnp.maximum(s, max_val).reshape((-1,) + (1,) * (x0.ndim - 1))
    return jnp.clip(x0, -s, s) / s


# -- the solver ---------------------------------------------------------------


class DPMSolver:
    """reference ``DPM_Solver`` (``deps/dpm_solver_pytorch.py:337-1251``)."""

    def __init__(self, model_fn: Callable, ns: NoiseScheduleVP, *,
                 algorithm_type: str = "dpmsolver++",
                 correcting_x0_fn: Callable | str | None = None,
                 thresholding_max_val: float = 1.0,
                 dynamic_thresholding_ratio: float = 0.995):
        assert algorithm_type in ("dpmsolver", "dpmsolver++")
        self.model = model_fn
        self.ns = ns
        self.algorithm_type = algorithm_type
        if correcting_x0_fn == "dynamic_thresholding":
            self.correcting_x0_fn = lambda x0, t: dynamic_thresholding(
                x0, ratio=dynamic_thresholding_ratio,
                max_val=thresholding_max_val)
        else:
            self.correcting_x0_fn = correcting_x0_fn

    # prediction forms -------------------------------------------------------

    def noise_prediction_fn(self, x, t):
        return self.model(x, t)

    def data_prediction_fn(self, x, t):
        noise = self.noise_prediction_fn(x, t)
        alpha_t = self.ns.marginal_alpha(t)
        sigma_t = self.ns.marginal_std(t)
        x0 = (x - _bc(sigma_t, x) * noise) / _bc(alpha_t, x)
        if self.correcting_x0_fn is not None:
            x0 = self.correcting_x0_fn(x0, t)
        return x0

    def model_fn(self, x, t):
        if self.algorithm_type == "dpmsolver++":
            return self.data_prediction_fn(x, t)
        return self.noise_prediction_fn(x, t)

    # time grids (host numpy, static) ----------------------------------------

    def get_time_steps(self, skip_type, t_T, t_0, N) -> np.ndarray:
        if skip_type == "logSNR":
            lam_T = float(self.ns.marginal_lambda_np(t_T))
            lam_0 = float(self.ns.marginal_lambda_np(t_0))
            lams = np.linspace(lam_T, lam_0, N + 1)
            return self.ns.inverse_lambda_np(lams)
        if skip_type == "time_uniform":
            return np.linspace(t_T, t_0, N + 1)
        if skip_type == "time_quadratic":
            return np.linspace(t_T ** 0.5, t_0 ** 0.5, N + 1) ** 2
        raise ValueError(skip_type)

    @staticmethod
    def _singlestep_plan(steps: int, order: int) -> list[int]:
        """Order of each outer step ('DPM-Solver-fast', reference ``:484-540``)."""
        if order == 3:
            K = steps // 3 + 1
            return {0: [3] * (K - 2) + [2, 1],
                    1: [3] * (K - 1) + [1],
                    2: [3] * (K - 1) + [2]}[steps % 3]
        if order == 2:
            return [2] * (steps // 2) if steps % 2 == 0 \
                else [2] * (steps // 2) + [1]
        if order == 1:
            return [1] * steps
        raise ValueError(order)

    # updates (traced) --------------------------------------------------------

    def first_update(self, x, s, t, model_s=None):
        ns = self.ns
        h = ns.marginal_lambda(t) - ns.marginal_lambda(s)
        if model_s is None:
            model_s = self.model_fn(x, jnp.full((x.shape[0],), s))
        if self.algorithm_type == "dpmsolver++":
            x_t = (_bc(ns.marginal_std(t) / ns.marginal_std(s), x) * x
                   - _bc(ns.marginal_alpha(t) * jnp.expm1(-h), x) * model_s)
        else:
            la_s = ns.marginal_log_mean_coeff(s)
            la_t = ns.marginal_log_mean_coeff(t)
            x_t = (_bc(jnp.exp(la_t - la_s), x) * x
                   - _bc(ns.marginal_std(t) * jnp.expm1(h), x) * model_s)
        return x_t, model_s

    def second_update(self, x, s, t, r1=0.5, model_s=None,
                      solver_type="dpmsolver"):
        ns = self.ns
        r1 = 0.5 if r1 is None else r1
        lam_s, lam_t = ns.marginal_lambda(s), ns.marginal_lambda(t)
        h = lam_t - lam_s
        s1 = ns.inverse_lambda(lam_s + r1 * h)
        tb = lambda tt: jnp.full((x.shape[0],), tt) if np.ndim(tt) == 0 \
            else tt
        if model_s is None:
            model_s = self.model_fn(x, tb(s))
        if self.algorithm_type == "dpmsolver++":
            sig_s, sig_s1, sig_t = (ns.marginal_std(v) for v in (s, s1, t))
            a_s1, a_t = ns.marginal_alpha(s1), ns.marginal_alpha(t)
            x_s1 = _bc(sig_s1 / sig_s, x) * x \
                - _bc(a_s1 * jnp.expm1(-r1 * h), x) * model_s
            model_s1 = self.model_fn(x_s1, tb(s1))
            if solver_type == "dpmsolver":
                x_t = (_bc(sig_t / sig_s, x) * x
                       - _bc(a_t * jnp.expm1(-h), x) * model_s
                       - _bc((0.5 / r1) * a_t * jnp.expm1(-h), x)
                       * (model_s1 - model_s))
            else:   # taylor
                x_t = (_bc(sig_t / sig_s, x) * x
                       - _bc(a_t * jnp.expm1(-h), x) * model_s
                       + _bc((1.0 / r1) * a_t * (jnp.expm1(-h) / h + 1.0), x)
                       * (model_s1 - model_s))
        else:
            la_s, la_s1, la_t = (ns.marginal_log_mean_coeff(v)
                                 for v in (s, s1, t))
            sig_s1, sig_t = ns.marginal_std(s1), ns.marginal_std(t)
            x_s1 = _bc(jnp.exp(la_s1 - la_s), x) * x \
                - _bc(sig_s1 * jnp.expm1(r1 * h), x) * model_s
            model_s1 = self.model_fn(x_s1, tb(s1))
            if solver_type == "dpmsolver":
                x_t = (_bc(jnp.exp(la_t - la_s), x) * x
                       - _bc(sig_t * jnp.expm1(h), x) * model_s
                       - _bc((0.5 / r1) * sig_t * jnp.expm1(h), x)
                       * (model_s1 - model_s))
            else:
                x_t = (_bc(jnp.exp(la_t - la_s), x) * x
                       - _bc(sig_t * jnp.expm1(h), x) * model_s
                       - _bc((1.0 / r1) * sig_t * (jnp.expm1(h) / h - 1.0), x)
                       * (model_s1 - model_s))
        return x_t, (model_s, model_s1)

    def third_update(self, x, s, t, r1=1.0 / 3.0, r2=2.0 / 3.0, model_s=None,
                     model_s1=None, solver_type="dpmsolver"):
        ns = self.ns
        r1 = 1.0 / 3.0 if r1 is None else r1
        r2 = 2.0 / 3.0 if r2 is None else r2
        lam_s, lam_t = ns.marginal_lambda(s), ns.marginal_lambda(t)
        h = lam_t - lam_s
        s1 = ns.inverse_lambda(lam_s + r1 * h)
        s2 = ns.inverse_lambda(lam_s + r2 * h)
        tb = lambda tt: jnp.full((x.shape[0],), tt) if np.ndim(tt) == 0 \
            else tt
        if model_s is None:
            model_s = self.model_fn(x, tb(s))
        if self.algorithm_type == "dpmsolver++":
            sig_s, sig_s1, sig_s2, sig_t = (ns.marginal_std(v)
                                            for v in (s, s1, s2, t))
            a_s1, a_s2, a_t = (ns.marginal_alpha(v) for v in (s1, s2, t))
            phi_11 = jnp.expm1(-r1 * h)
            phi_12 = jnp.expm1(-r2 * h)
            phi_1 = jnp.expm1(-h)
            phi_22 = jnp.expm1(-r2 * h) / (r2 * h) + 1.0
            phi_2 = phi_1 / h + 1.0
            phi_3 = phi_2 / h - 0.5
            if model_s1 is None:
                x_s1 = _bc(sig_s1 / sig_s, x) * x \
                    - _bc(a_s1 * phi_11, x) * model_s
                model_s1 = self.model_fn(x_s1, tb(s1))
            x_s2 = (_bc(sig_s2 / sig_s, x) * x
                    - _bc(a_s2 * phi_12, x) * model_s
                    + _bc(r2 / r1 * a_s2 * phi_22, x) * (model_s1 - model_s))
            model_s2 = self.model_fn(x_s2, tb(s2))
            if solver_type == "dpmsolver":
                x_t = (_bc(sig_t / sig_s, x) * x
                       - _bc(a_t * phi_1, x) * model_s
                       + _bc((1.0 / r2) * a_t * phi_2, x)
                       * (model_s2 - model_s))
            else:
                D1_0 = (1.0 / r1) * (model_s1 - model_s)
                D1_1 = (1.0 / r2) * (model_s2 - model_s)
                D1 = (r2 * D1_0 - r1 * D1_1) / (r2 - r1)
                D2 = 2.0 * (D1_1 - D1_0) / (r2 - r1)
                x_t = (_bc(sig_t / sig_s, x) * x
                       - _bc(a_t * phi_1, x) * model_s
                       + _bc(a_t * phi_2, x) * D1
                       - _bc(a_t * phi_3, x) * D2)
        else:
            la_s, la_s1, la_s2, la_t = (ns.marginal_log_mean_coeff(v)
                                        for v in (s, s1, s2, t))
            sig_s1, sig_s2, sig_t = (ns.marginal_std(v)
                                     for v in (s1, s2, t))
            phi_11 = jnp.expm1(r1 * h)
            phi_12 = jnp.expm1(r2 * h)
            phi_1 = jnp.expm1(h)
            phi_22 = jnp.expm1(r2 * h) / (r2 * h) - 1.0
            phi_2 = phi_1 / h - 1.0
            phi_3 = phi_2 / h - 0.5
            if model_s1 is None:
                x_s1 = _bc(jnp.exp(la_s1 - la_s), x) * x \
                    - _bc(sig_s1 * phi_11, x) * model_s
                model_s1 = self.model_fn(x_s1, tb(s1))
            x_s2 = (_bc(jnp.exp(la_s2 - la_s), x) * x
                    - _bc(sig_s2 * phi_12, x) * model_s
                    - _bc(r2 / r1 * sig_s2 * phi_22, x)
                    * (model_s1 - model_s))
            model_s2 = self.model_fn(x_s2, tb(s2))
            if solver_type == "dpmsolver":
                x_t = (_bc(jnp.exp(la_t - la_s), x) * x
                       - _bc(sig_t * phi_1, x) * model_s
                       - _bc((1.0 / r2) * sig_t * phi_2, x)
                       * (model_s2 - model_s))
            else:
                D1_0 = (1.0 / r1) * (model_s1 - model_s)
                D1_1 = (1.0 / r2) * (model_s2 - model_s)
                D1 = (r2 * D1_0 - r1 * D1_1) / (r2 - r1)
                D2 = 2.0 * (D1_1 - D1_0) / (r2 - r1)
                x_t = (_bc(jnp.exp(la_t - la_s), x) * x
                       - _bc(sig_t * phi_1, x) * model_s
                       - _bc(sig_t * phi_2, x) * D1
                       - _bc(sig_t * phi_3, x) * D2)
        return x_t, (model_s, model_s1, model_s2)

    def singlestep_update(self, x, s, t, order, solver_type="dpmsolver",
                          r1=None, r2=None):
        if order == 1:
            return self.first_update(x, s, t)[0]
        if order == 2:
            return self.second_update(x, s, t, r1=r1,
                                      solver_type=solver_type)[0]
        if order == 3:
            return self.third_update(x, s, t, r1=r1, r2=r2,
                                     solver_type=solver_type)[0]
        raise ValueError(order)

    # multistep updates -------------------------------------------------------

    def multistep_second_update(self, x, model_prev, t_prev, t,
                                solver_type="dpmsolver"):
        ns = self.ns
        m1, m0 = model_prev[-2], model_prev[-1]
        t1, t0 = t_prev[-2], t_prev[-1]
        lam1, lam0, lam_t = (ns.marginal_lambda(v) for v in (t1, t0, t))
        h0, h = lam0 - lam1, lam_t - lam0
        r0 = h0 / h
        D1_0 = (1.0 / r0) * (m0 - m1)
        if self.algorithm_type == "dpmsolver++":
            sig0, sig_t = ns.marginal_std(t0), ns.marginal_std(t)
            a_t = ns.marginal_alpha(t)
            phi_1 = jnp.expm1(-h)
            if solver_type == "dpmsolver":
                return (_bc(sig_t / sig0, x) * x
                        - _bc(a_t * phi_1, x) * m0
                        - 0.5 * _bc(a_t * phi_1, x) * D1_0)
            return (_bc(sig_t / sig0, x) * x
                    - _bc(a_t * phi_1, x) * m0
                    + _bc(a_t * (phi_1 / h + 1.0), x) * D1_0)
        la0 = ns.marginal_log_mean_coeff(t0)
        la_t = ns.marginal_log_mean_coeff(t)
        sig_t = ns.marginal_std(t)
        phi_1 = jnp.expm1(h)
        if solver_type == "dpmsolver":
            return (_bc(jnp.exp(la_t - la0), x) * x
                    - _bc(sig_t * phi_1, x) * m0
                    - 0.5 * _bc(sig_t * phi_1, x) * D1_0)
        return (_bc(jnp.exp(la_t - la0), x) * x
                - _bc(sig_t * phi_1, x) * m0
                - _bc(sig_t * (phi_1 / h - 1.0), x) * D1_0)

    def multistep_third_update(self, x, model_prev, t_prev, t,
                               solver_type="dpmsolver"):
        ns = self.ns
        m2, m1, m0 = model_prev[-3], model_prev[-2], model_prev[-1]
        t2, t1, t0 = t_prev[-3], t_prev[-2], t_prev[-1]
        lam2, lam1, lam0, lam_t = (ns.marginal_lambda(v)
                                   for v in (t2, t1, t0, t))
        h1, h0, h = lam1 - lam2, lam0 - lam1, lam_t - lam0
        r0, r1 = h0 / h, h1 / h
        D1_0 = (1.0 / r0) * (m0 - m1)
        D1_1 = (1.0 / r1) * (m1 - m2)
        D1 = D1_0 + (r0 / (r0 + r1)) * (D1_0 - D1_1)
        D2 = (1.0 / (r0 + r1)) * (D1_0 - D1_1)
        if self.algorithm_type == "dpmsolver++":
            sig0, sig_t = ns.marginal_std(t0), ns.marginal_std(t)
            a_t = ns.marginal_alpha(t)
            phi_1 = jnp.expm1(-h)
            phi_2 = phi_1 / h + 1.0
            phi_3 = phi_2 / h - 0.5
            return (_bc(sig_t / sig0, x) * x
                    - _bc(a_t * phi_1, x) * m0
                    + _bc(a_t * phi_2, x) * D1
                    - _bc(a_t * phi_3, x) * D2)
        la0 = ns.marginal_log_mean_coeff(t0)
        la_t = ns.marginal_log_mean_coeff(t)
        sig_t = ns.marginal_std(t)
        phi_1 = jnp.expm1(h)
        phi_2 = phi_1 / h - 1.0
        phi_3 = phi_2 / h - 0.5
        return (_bc(jnp.exp(la_t - la0), x) * x
                - _bc(sig_t * phi_1, x) * m0
                - _bc(sig_t * phi_2, x) * D1
                - _bc(sig_t * phi_3, x) * D2)

    def multistep_update(self, x, model_prev, t_prev, t, order,
                         solver_type="dpmsolver"):
        if order == 1:
            return self.first_update(x, t_prev[-1], t,
                                     model_s=model_prev[-1])[0]
        if order == 2:
            return self.multistep_second_update(x, model_prev, t_prev, t,
                                                solver_type=solver_type)
        if order == 3:
            return self.multistep_third_update(x, model_prev, t_prev, t,
                                               solver_type=solver_type)
        raise ValueError(order)

    def denoise_to_zero_fn(self, x, s):
        return self.data_prediction_fn(x, s)

    # orchestration ------------------------------------------------------------

    def sample(self, x, *, steps: int = 20, t_start=None, t_end=None,
               order: int = 2, skip_type: str = "time_uniform",
               method: str = "multistep", lower_order_final: bool = True,
               denoise_to_zero: bool = False, solver_type: str = "dpmsolver",
               atol: float = 0.0078, rtol: float = 0.05):
        """reference ``sample`` (``deps/dpm_solver_pytorch.py:1047-1251``)."""
        t_0 = 1.0 / self.ns.total_N if t_end is None else t_end
        t_T = self.ns.T if t_start is None else t_start

        if method == "adaptive":
            return self.adaptive(x, order=order, t_T=t_T, t_0=t_0,
                                 atol=atol, rtol=rtol,
                                 solver_type=solver_type)

        b = x.shape[0]
        if method == "multistep":
            assert steps >= order
            ts = self.get_time_steps(skip_type, t_T, t_0, steps)
            t_prev = [ts[0]]
            model_prev = [self.model_fn(x, jnp.full((b,), ts[0]))]
            for step in range(1, order):
                x = self.multistep_update(x, model_prev, t_prev, ts[step],
                                          step, solver_type=solver_type)
                t_prev.append(ts[step])
                model_prev.append(self.model_fn(x, jnp.full((b,), ts[step])))
            for step in range(order, steps + 1):
                if lower_order_final and steps < 10:
                    step_order = min(order, steps + 1 - step)
                else:
                    step_order = order
                x = self.multistep_update(x, model_prev, t_prev, ts[step],
                                          step_order, solver_type=solver_type)
                t_prev = t_prev[1:] + [ts[step]]
                if step < steps:
                    model_prev = model_prev[1:] + [
                        self.model_fn(x, jnp.full((b,), ts[step]))]
        elif method in ("singlestep", "singlestep_fixed"):
            if method == "singlestep":
                orders = self._singlestep_plan(steps, order)
                if skip_type == "logSNR":
                    ts_outer = self.get_time_steps(skip_type, t_T, t_0,
                                                   len(orders))
                else:
                    full = self.get_time_steps(skip_type, t_T, t_0, steps)
                    ts_outer = full[np.cumsum([0] + orders)]
            else:
                K = steps // order
                orders = [order] * K
                ts_outer = self.get_time_steps(skip_type, t_T, t_0, K)
            for i, od in enumerate(orders):
                s_i, t_i = float(ts_outer[i]), float(ts_outer[i + 1])
                ts_inner = self.get_time_steps(skip_type, s_i, t_i, od)
                lam = self.ns.marginal_lambda_np(ts_inner)
                h = lam[-1] - lam[0]
                r1 = None if od <= 1 else float((lam[1] - lam[0]) / h)
                r2 = None if od <= 2 else float((lam[2] - lam[0]) / h)
                x = self.singlestep_update(x, s_i, t_i, od,
                                           solver_type=solver_type,
                                           r1=r1, r2=r2)
        else:
            raise ValueError(method)

        if denoise_to_zero:
            x = self.denoise_to_zero_fn(x, jnp.full((b,), t_0))
        return x

    def inverse(self, x, *, steps: int = 20, t_start=None, t_end=None,
                order: int = 2, skip_type: str = "time_uniform",
                method: str = "multistep", lower_order_final: bool = True,
                solver_type: str = "dpmsolver"):
        """Inversion x_0 -> x_T: run the solver with the time range flipped
        (reference ``:1032-1045``)."""
        t_0 = 1.0 / self.ns.total_N if t_start is None else t_start
        t_T = self.ns.T if t_end is None else t_end
        return self.sample(x, steps=steps, t_start=t_0, t_end=t_T,
                           order=order, skip_type=skip_type, method=method,
                           lower_order_final=lower_order_final,
                           solver_type=solver_type)

    def adaptive(self, x, *, order: int, t_T: float, t_0: float,
                 h_init: float = 0.05, atol: float = 0.0078,
                 rtol: float = 0.05, theta: float = 0.9,
                 t_err: float = 1e-5, solver_type: str = "dpmsolver"):
        """DPM-Solver-12/23 (reference ``:956-1030``) as a while_loop."""
        ns = self.ns
        lam_0 = ns.marginal_lambda(jnp.asarray(t_0))

        if order == 2:
            def lower(x, s, t):
                return self.first_update(x, s, t)

            def higher(x, s, t, model_s):
                return self.second_update(x, s, t, r1=0.5, model_s=model_s,
                                          solver_type=solver_type)[0]
        elif order == 3:
            def lower(x, s, t):
                x_t, ms = self.second_update(x, s, t, r1=1.0 / 3.0,
                                             solver_type=solver_type)
                return x_t, ms[0]

            def higher(x, s, t, model_s):
                return self.third_update(x, s, t, r1=1.0 / 3.0, r2=2.0 / 3.0,
                                         model_s=model_s,
                                         solver_type=solver_type)[0]
        else:
            raise ValueError(order)

        def cond(state):
            xc, x_prev, s, h, nfe = state
            return (jnp.abs(s - t_0) > t_err) & (nfe < 10_000)

        def body(state):
            xc, x_prev, s, h, nfe = state
            lam_s = ns.marginal_lambda(s)
            t = ns.inverse_lambda(lam_s + h)
            x_lower, model_s = lower(xc, s, t)
            x_higher = higher(xc, s, t, model_s)
            delta = jnp.maximum(atol, rtol * jnp.maximum(jnp.abs(x_lower),
                                                         jnp.abs(x_prev)))
            err = jnp.sqrt(jnp.mean(((x_higher - x_lower) / delta) ** 2))
            accept = err <= 1.0
            xn = jnp.where(accept, x_higher, xc)
            x_prev_n = jnp.where(accept, x_lower, x_prev)
            s_n = jnp.where(accept, t, s)
            h_n = jnp.minimum(theta * h * err ** (-1.0 / order),
                              lam_0 - ns.marginal_lambda(s_n))
            return xn, x_prev_n, s_n, h_n, nfe + order

        state = (x, x, jnp.asarray(t_T, jnp.float32),
                 jnp.asarray(h_init, jnp.float32), jnp.asarray(0, jnp.int32))
        x, _, _, _, nfe = jax.lax.while_loop(cond, body, state)
        return x
