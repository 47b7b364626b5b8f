"""Adaptive RK45 (Dormand-Prince 5(4)) as a jitted ``lax.while_loop``.

On-device replacement for the reference's host-side
``scipy.integrate.solve_ivp(..., method='RK45')``
(``deps/score_sde_pytorch/sampling.py:414-485`` and ``likelihood.py:26-113``):
same tableau, same error norm (RMS over all elements, scipy convention),
same step-size controller (order-5 embedded pair, safety 0.9, factors
[0.2, 10]).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Dormand-Prince coefficients
_C = jnp.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_A = [
    [],
    [1 / 5],
    [3 / 40, 9 / 40],
    [44 / 45, -56 / 15, 32 / 9],
    [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
    [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
    [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
]
_B5 = jnp.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784,
                 11 / 84, 0.0])
_B4 = jnp.array([5179 / 57600, 0.0, 7571 / 16695, 393 / 640,
                 -92097 / 339200, 187 / 2100, 1 / 40])

_SAFETY, _MIN_FACTOR, _MAX_FACTOR, _ORDER = 0.9, 0.2, 10.0, 5.0
_MAX_STEPS = 10_000


def rk45_integrate(f, y0, t0: float, t1: float, *, rtol=1e-5, atol=1e-5):
    """Integrate dy/dt = f(y, t) from t0 to t1 (t1 < t0 supported).

    Returns (y(t1), nfe).  ``f`` must be traceable; shapes static."""
    direction = 1.0 if t1 >= t0 else -1.0

    def rms(e):
        return jnp.sqrt(jnp.mean(e ** 2))

    def scaled_err(err, y_old, y_new):
        scale = atol + jnp.maximum(jnp.abs(y_old), jnp.abs(y_new)) * rtol
        return rms(err / scale)

    # initial step heuristic (scipy _select_initial_step, simplified)
    f0 = f(y0, t0)
    d0 = rms(y0 / (atol + jnp.abs(y0) * rtol))
    d1 = rms(f0 / (atol + jnp.abs(y0) * rtol))
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)
    h0 = jnp.minimum(h0, jnp.abs(t1 - t0))

    def step_once(y, t, h):
        ks = [f(y, t)]
        for i in range(1, 7):
            a = _A[i]
            dy = sum(a[j] * ks[j] for j in range(len(a)))
            ks.append(f(y + h * dy, t + _C[i] * h))
        k = jnp.stack(ks)
        y5 = y + h * jnp.tensordot(_B5, k, axes=1)
        err = h * jnp.tensordot(_B5 - _B4, k, axes=1)
        return y5, err

    def cond(state):
        y, t, h, nfe, done, steps = state
        return (~done) & (steps < _MAX_STEPS)

    def body(state):
        y, t, h, nfe, done, steps = state
        # clamp the step to not overshoot t1
        h_eff = direction * jnp.minimum(jnp.abs(h), jnp.abs(t1 - t))
        y_new, err = step_once(y, t, h_eff)
        e = scaled_err(err, y, y_new)
        accept = e <= 1.0
        factor = jnp.where(
            e == 0.0, _MAX_FACTOR,
            jnp.clip(_SAFETY * e ** (-1.0 / _ORDER), _MIN_FACTOR,
                     _MAX_FACTOR))
        h_next = jnp.abs(h_eff) * factor
        y = jnp.where(accept, y_new, y)
        t = jnp.where(accept, t + h_eff, t)
        done = accept & (jnp.abs(t1 - t) <= 1e-12)
        return (y, t, direction * h_next, nfe + 6, done,
                steps + 1)

    init = (y0, jnp.asarray(t0, y0.dtype), direction * h0,
            jnp.asarray(1, jnp.int32), jnp.asarray(False), 0)
    y, t, h, nfe, done, steps = jax.lax.while_loop(cond, body, init)
    return y, nfe
