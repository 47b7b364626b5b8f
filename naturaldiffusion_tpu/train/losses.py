"""Score-matching losses + optimizer factory.

Rebuild of ``deps/score_sde_pytorch/losses.py:26-210`` on optax/jax:
continuous denoising-score-matching with optional likelihood weighting, and
the discrete SMLD/DDPM losses.  The train step itself lives in
:mod:`naturaldiffusion_tpu.train.state` (jit/pjit-able, EMA included).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import optax

from ..sde import SDE, VPSDE, VESDE, get_score_fn, _bcast


def make_optimizer(lr: float = 2e-4, beta1: float = 0.9, eps: float = 1e-8,
                   warmup: int = 5000, grad_clip: float = 1.0):
    """Adam + linear warmup + global-norm clip
    (reference ``losses.py:26-53`` ``optimization_manager``)."""
    schedule = optax.linear_schedule(0.0, lr, max(warmup, 1))
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip) if grad_clip > 0
        else optax.identity(),
        optax.scale_by_adam(b1=beta1, b2=0.999, eps=eps),
        optax.scale_by_learning_rate(schedule),
    )
    return tx


def sde_loss_fn(sde: SDE, apply_fn, params, key, batch, *,
                train: bool = True, reduce_mean: bool = True,
                likelihood_weighting: bool = False, eps: float = 1e-5,
                continuous: bool = True):
    """Continuous-time DSM loss (reference ``get_sde_loss_fn``,
    ``losses.py:55-101``).  ``apply_fn(params, x, t_label)`` is the raw
    network; label conventions handled by :func:`get_score_fn`."""
    kt, kz = jax.random.split(key)
    b = batch.shape[0]
    t = jax.random.uniform(kt, (b,), minval=eps, maxval=sde.T)
    z = jax.random.normal(kz, batch.shape)
    mean, std = sde.marginal_prob(batch, t)
    perturbed = mean + _bcast(jnp.atleast_1d(std), batch) * z

    score_fn = get_score_fn(sde, lambda x, tl: apply_fn(params, x, tl),
                            continuous=continuous)
    score = score_fn(perturbed, t)

    if not likelihood_weighting:
        losses = jnp.square(score * _bcast(jnp.atleast_1d(std), batch) + z)
    else:
        g2 = sde.sde(jnp.zeros_like(batch), t)[1] ** 2
        losses = jnp.square(score + z / _bcast(jnp.atleast_1d(std), batch))
        losses = losses * _bcast(g2, batch)

    losses = losses.reshape(b, -1)
    losses = jnp.mean(losses, -1) if reduce_mean \
        else 0.5 * jnp.sum(losses, -1)
    return jnp.mean(losses)


def smld_loss_fn(vesde: VESDE, apply_fn, params, key, batch, *,
                 reduce_mean: bool = False):
    """Discrete SMLD (NCSN) loss (reference ``losses.py:104-128``)."""
    kt, kz = jax.random.split(key)
    b = batch.shape[0]
    sigmas = jnp.exp(jnp.linspace(math.log(vesde.sigma_max),
                                  math.log(vesde.sigma_min), vesde.N))
    labels = jax.random.randint(kt, (b,), 0, vesde.N)
    sigma = sigmas[labels]
    noise = jax.random.normal(kz, batch.shape) * _bcast(sigma, batch)
    perturbed = batch + noise
    score = apply_fn(params, perturbed, labels)
    target = -noise / _bcast(sigma ** 2, batch)
    losses = jnp.square(score - target).reshape(b, -1) \
        * (sigma ** 2)[:, None]
    per = jnp.mean(losses, -1) if reduce_mean else 0.5 * jnp.sum(losses, -1)
    return jnp.mean(per)


def ddpm_loss_fn(vpsde: VPSDE, apply_fn, params, key, batch, *,
                 reduce_mean: bool = True):
    """Discrete DDPM eps-matching loss (reference ``losses.py:131-149``)."""
    kt, kz = jax.random.split(key)
    b = batch.shape[0]
    betas = jnp.linspace(vpsde.beta_min / vpsde.N, vpsde.beta_max / vpsde.N,
                         vpsde.N)
    abar = jnp.cumprod(1.0 - betas)
    labels = jax.random.randint(kt, (b,), 0, vpsde.N)
    noise = jax.random.normal(kz, batch.shape)
    perturbed = _bcast(jnp.sqrt(abar[labels]), batch) * batch \
        + _bcast(jnp.sqrt(1.0 - abar[labels]), batch) * noise
    pred = apply_fn(params, perturbed, labels)
    losses = jnp.square(pred - noise).reshape(b, -1)
    per = jnp.mean(losses, -1) if reduce_mean else 0.5 * jnp.sum(losses, -1)
    return jnp.mean(per)
