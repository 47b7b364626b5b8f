"""Controllable generation: PC inpainting and colorization.

Rebuild of ``deps/score_sde_pytorch/controllable_generation.py:8-180`` on the
scan-based PC framework (NHWC): every predictor/corrector update is followed
by a projection onto the known data — masked pixels for inpainting, the
gray-scale channel (under an orthonormal color decoupling) for colorization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..sde import SDE, _bcast
from .pc import get_predictor, get_corrector


def _pc_projected_sampler(sde: SDE, score_fn, x_init, project, *,
                          predictor: str, corrector: str, snr: float,
                          n_steps: int, denoise: bool, eps: float):
    """Shared scan: corrector -> project -> predictor -> project."""
    pred = get_predictor(predictor)
    corr = functools.partial(get_corrector(corrector), snr=snr,
                             n_steps=n_steps)
    timesteps = jnp.linspace(sde.T, eps, sde.N)
    b = x_init.shape[0]

    def step(carry, t):
        x, key = carry
        key, kc, kp, k1, k2 = jax.random.split(key, 5)
        tb = jnp.full((b,), t)
        x, _ = corr(sde, score_fn, x, tb, kc)
        x = project(x, tb, k1, mean=False)
        x, _ = pred(sde, score_fn, x, tb, kp)
        x_mean = project(x, tb, k2, mean=True)
        x = project(x, tb, k2, mean=False)
        return (x, key), x_mean

    def sampler(key):
        (x, _), means = jax.lax.scan(step, (x_init, key), timesteps)
        return means[-1] if denoise else x

    return sampler


def get_pc_inpainter(sde: SDE, score_fn, *, predictor="reverse_diffusion",
                     corrector="langevin", snr: float = 0.16,
                     n_steps: int = 1, denoise: bool = True,
                     eps: float = 1e-5,
                     inverse_scaler=lambda x: x):
    """``inpainter(key, data, mask) -> images``; mask==1 marks KNOWN pixels
    (reference ``controllable_generation.py:8-84``).  NHWC."""
    def inpainter(key, data, mask):
        key, sub = jax.random.split(key)
        x0 = data * mask + sde.prior_sampling(sub, data.shape) * (1.0 - mask)

        def project(x, tb, k, *, mean: bool):
            m, std = sde.marginal_prob(data, tb)
            known = m if mean else m + jax.random.normal(k, x.shape) \
                * _bcast(jnp.atleast_1d(std), x)
            return x * (1.0 - mask) + known * mask

        sampler = _pc_projected_sampler(
            sde, score_fn, x0, project, predictor=predictor,
            corrector=corrector, snr=snr, n_steps=n_steps, denoise=denoise,
            eps=eps)
        return inverse_scaler(sampler(key))

    return inpainter


# orthonormal color decoupling: channel 0 of the decoupled space is the
# gray-scale average (reference ``controllable_generation.py:105-120``)
_M = np.array([[5.7735014e-01, -8.1649649e-01, 4.7008697e-08],
               [5.7735026e-01, 4.0824834e-01, 7.0710671e-01],
               [5.7735026e-01, 4.0824822e-01, -7.0710683e-01]],
              dtype=np.float32)
_INV_M = np.linalg.inv(_M)


def decouple(x):
    """NHWC einsum against M (reference uses NCHW 'bihw,ij->bjhw')."""
    return jnp.einsum("bhwi,ij->bhwj", x, jnp.asarray(_M, x.dtype))


def couple(x):
    return jnp.einsum("bhwi,ij->bhwj", x, jnp.asarray(_INV_M, x.dtype))


def get_pc_colorizer(sde: SDE, score_fn, *, predictor="reverse_diffusion",
                     corrector="langevin", snr: float = 0.16,
                     n_steps: int = 1, denoise: bool = True,
                     eps: float = 1e-5,
                     inverse_scaler=lambda x: x):
    """``colorizer(key, gray_img) -> images``; gray_img has equal RGB
    channels (reference ``controllable_generation.py:87-180``).  NHWC."""
    def mask_like(x):
        return jnp.concatenate(
            [jnp.ones_like(x[..., :1]), jnp.zeros_like(x[..., 1:])], axis=-1)

    def colorizer(key, gray):
        mask = mask_like(gray)
        key, sub = jax.random.split(key)
        x0 = couple(decouple(gray) * mask
                    + decouple(sde.prior_sampling(sub, gray.shape))
                    * (1.0 - mask))

        def project(x, tb, k, *, mean: bool):
            m, std = sde.marginal_prob(decouple(gray), tb)
            known = m if mean else m + jax.random.normal(k, x.shape) \
                * _bcast(jnp.atleast_1d(std), x)
            return couple(decouple(x) * (1.0 - mask) + known * mask)

        sampler = _pc_projected_sampler(
            sde, score_fn, x0, project, predictor=predictor,
            corrector=corrector, snr=snr, n_steps=n_steps, denoise=denoise,
            eps=eps)
        return inverse_scaler(sampler(key))

    return colorizer
