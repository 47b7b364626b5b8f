"""Probability-flow ODE log-likelihood (bits/dim) with Hutchinson trace.

Rebuild of ``deps/score_sde_pytorch/likelihood.py:26-113``: integrate the
augmented ODE d[x, log p]/dt from eps to T with the on-device RK45, estimate
the drift divergence with a Hutchinson probe (rademacher | gaussian), add the
prior log-density, convert to bits/dim.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp

from ..sde import SDE
from ..samplers.rk45 import rk45_integrate


def get_div_fn(drift_fn: Callable):
    """divergence via jvp against a probe vector (``likelihood.py:26-35``)."""
    from ..ops.conv3x3 import xla_conv_only

    def div_fn(x, t, eps):
        eps = eps.astype(x.dtype)  # integrator state may be wider (x64)
        # forward-mode cannot cross the custom-VJP Pallas conv, so only
        # THIS trace pins to the XLA convs; the integrator's direct
        # drift_fn evaluations keep whatever NATDIFF_PALLAS_CONV selects
        with xla_conv_only():
            _, jvp = jax.jvp(lambda y: drift_fn(y, t), (x,), (eps,))
        return jnp.sum((jvp * eps).reshape(x.shape[0], -1), axis=-1)
    return div_fn


def get_likelihood_fn(sde: SDE, score_fn, *, hutchinson_type: str = "rademacher",
                      rtol: float = 1e-5, atol: float = 1e-5,
                      eps: float = 1e-5,
                      inverse_scaler: Callable = lambda x: x):
    """Returns ``likelihood_fn(key, data) -> (bpd, z, nfe)``.

    ``data`` is the scaled model-space input; ``inverse_scaler`` maps back to
    [0,1] for the dequantization offset (reference ``likelihood.py:94-105``).
    """
    rsde = sde.reverse(score_fn, probability_flow=True)

    def drift_fn(x, t):
        return rsde.sde(x, t)[0]

    div_fn = get_div_fn(drift_fn)

    def likelihood_fn(key, data):
        shape = data.shape
        b = shape[0]
        if hutchinson_type == "gaussian":
            probe = jax.random.normal(key, shape)
        elif hutchinson_type == "rademacher":
            probe = jax.random.rademacher(key, shape, dtype=data.dtype)
        else:
            raise ValueError(hutchinson_type)

        dims = math.prod(shape[1:])

        def ode_fn(state, t):
            x = state[:, :dims].reshape(shape)
            tb = jnp.full((b,), t)
            dx = drift_fn(x, tb).reshape(b, -1)
            dlogp = div_fn(x, tb, probe)[:, None]
            return jnp.concatenate([dx, dlogp], axis=1)

        init = jnp.concatenate(
            [data.reshape(b, -1), jnp.zeros((b, 1), data.dtype)], axis=1)
        out, nfe = rk45_integrate(ode_fn, init, eps, sde.T,
                                  rtol=rtol, atol=atol)
        z = out[:, :dims].reshape(shape)
        delta_logp = out[:, dims]
        prior_logp = sde.prior_logp(z)
        bpd = -(prior_logp + delta_logp) / math.log(2) / dims
        # dequantization offset (reference likelihood.py:100-104 computes
        # ``7 - inverse_scaler(-1)``: 7 for centered data, 8 for uncentered).
        # Equivalent closed form for the affine scalers: 8 + log2(scale),
        # where scale is the per-dim Jacobian of the inverse map.
        offset = 8.0 + _inverse_scaler_log_det(inverse_scaler)
        return bpd + offset, z, nfe

    return likelihood_fn


def _inverse_scaler_log_det(inverse_scaler) -> float:
    """log2 of the per-dim Jacobian of the (affine) inverse scaler, probed
    directly: centered data has scale 1/2 -> -1, uncentered scale 1 -> 0."""
    a = float(inverse_scaler(jnp.asarray(0.0)))
    b = float(inverse_scaler(jnp.asarray(1.0)))
    return math.log2(abs(b - a)) if b != a else 0.0
