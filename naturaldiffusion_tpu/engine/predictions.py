"""Model-output -> predicted-x0 conversions.

The NI engine is parameterisation-agnostic: whatever the denoiser predicts
(eps, score, x0, or a velocity), it is converted to a predicted x0 before
entering the weighted-sum recursion.  Conversion sites in the reference:

* eps   -> x0: ``src/ValidateNaturalInference.py:177-182`` (DiT)
* score -> x0: ``src/CIFAR10NaturalInference.py:219-230`` (``data_fn``, fp64)
* flow v-> x0: ``src/SD3NaturalInference.py:215-217`` (SD3, x0 = x - sigma*v)
* VP v  -> x0: standard v-parameterisation (x0 = alpha*x - sigma*v)

All formulas are in terms of the ideal marginal (alpha_t, sigma_t) carried in
``CoeffMatrix.node``.  The divisions are computed in ``accum_dtype`` (float32
by default; the reference uses fp64 — see SURVEY.md §7 dtype policy).
"""

from __future__ import annotations

import jax.numpy as jnp

PREDICTION_TYPES = ("eps", "x0", "score", "v_flow", "v_vp")


def to_x0(pred, x, alpha, sigma, prediction_type: str, accum_dtype=jnp.float32):
    """Convert a model output ``pred`` at state ``x`` into predicted x0."""
    p = pred.astype(accum_dtype)
    xt = x.astype(accum_dtype)
    alpha = jnp.asarray(alpha, accum_dtype)
    sigma = jnp.asarray(sigma, accum_dtype)
    if prediction_type == "eps":
        return (xt - sigma * p) / alpha
    if prediction_type == "x0":
        return p
    if prediction_type == "score":
        # score = -eps/sigma  =>  x0 = (score*sigma^2 + x)/alpha
        return (p * sigma ** 2 + xt) / alpha
    if prediction_type == "v_flow":
        # rectified flow: x = (1-sigma) x0 + sigma eps, v = eps - x0
        return xt - sigma * p
    if prediction_type == "v_vp":
        return alpha * xt - sigma * p
    raise ValueError(f"unknown prediction_type {prediction_type!r}; "
                     f"expected one of {PREDICTION_TYPES}")


def from_x0(x0, x, alpha, sigma, prediction_type: str):
    """Inverse of :func:`to_x0` (used by tests and by model wrappers that
    must re-emit a different parameterisation)."""
    if prediction_type == "x0":
        return x0
    if prediction_type == "eps":
        return (x - alpha * x0) / sigma
    if prediction_type == "score":
        return (alpha * x0 - x) / sigma ** 2
    if prediction_type == "v_flow":
        return (x - x0) / sigma
    if prediction_type == "v_vp":
        return (alpha * x - x0) / sigma
    raise ValueError(f"unknown prediction_type {prediction_type!r}")
