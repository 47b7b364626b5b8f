"""Guidance combinators: wrap a conditional network into a ``(x, t) -> pred``
denoiser for the NI engine.

Reference CFG sites: ``src/ValidateNaturalInference.py:185-195``
(``forward_cfg`` — DiT duplicates the batch for cond+uncond and fuses), the
DiT 3-channel quirk (``deps/DiT/models.py:255-272``), and the SD3 two-pass
CFG at ``src/SD3NaturalInference.py:210-217``.  The generic model wrapper
taxonomy (uncond / classifier / classifier-free) follows
``deps/dpm_solver_pytorch.py:170-335``.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp


def classifier_free(model_fn: Callable, cond, uncond, scale: float,
                    *, split_channels: int | None = None) -> Callable:
    """Classifier-free guidance: ``u + s * (c - u)``.

    ``model_fn(x, t, conditioning) -> pred``.  The two passes are fused into
    ONE batched call (batch doubling), so the MXU sees a single large matmul
    instead of two half-size ones.

    ``split_channels``: if set, only the first ``split_channels`` output
    channels are guided and the rest are passed through from the conditional
    branch — the DiT ``forward_with_cfg`` quirk (``deps/DiT/models.py:263-267``
    guides only the 3 eps channels of the 8-channel learn-sigma output).
    """
    def denoise(x, t):
        x2 = jnp.concatenate([x, x], axis=0)
        c2 = jnp.concatenate([cond, uncond], axis=0)
        out = model_fn(x2, t, c2)
        c_out, u_out = jnp.split(out, 2, axis=0)
        if split_channels is None:
            return u_out + scale * (c_out - u_out)
        guided = u_out[:, :split_channels] + scale * (
            c_out[:, :split_channels] - u_out[:, :split_channels])
        return jnp.concatenate([guided, c_out[:, split_channels:]], axis=1)
    return denoise


def classifier_free_two_pass(model_fn: Callable, cond, uncond,
                             scale: float) -> Callable:
    """CFG with two sequential passes (half the peak activation memory;
    matches the SD3 reference loop ``src/SD3NaturalInference.py:210-217``)."""
    def denoise(x, t):
        c_out = model_fn(x, t, cond)
        u_out = model_fn(x, t, uncond)
        return u_out + scale * (c_out - u_out)
    return denoise


def unconditional(model_fn: Callable) -> Callable:
    def denoise(x, t):
        return model_fn(x, t)
    return denoise
