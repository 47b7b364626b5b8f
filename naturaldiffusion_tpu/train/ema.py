"""Exponential moving average of parameters.

Rebuild of ``deps/score_sde_pytorch/models/ema.py:10-97`` as a pure pytree
transform (store/copy_to/restore become value semantics — no mutation)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class EMA:
    shadow: object            # pytree of ema params
    decay: float = 0.9999
    num_updates: int = 0      # jnp scalar or int
    warmup: bool = True       # reference's num_updates decay ramp

    @classmethod
    def create(cls, params, decay: float = 0.9999, warmup: bool = True):
        return cls(shadow=params, decay=decay, num_updates=0, warmup=warmup)

    def update(self, params) -> "EMA":
        n = self.num_updates + 1
        decay = self.decay
        if self.warmup:
            decay = jnp.minimum(decay, (1.0 + n) / (10.0 + n))
        one_minus = 1.0 - decay
        shadow = jax.tree.map(
            lambda s, p: s - one_minus * (s - p), self.shadow, params)
        return dataclasses.replace(self, shadow=shadow, num_updates=n)


jax.tree_util.register_pytree_node(
    EMA,
    lambda e: ((e.shadow, e.num_updates), (e.decay, e.warmup)),
    lambda aux, ch: EMA(shadow=ch[0], num_updates=ch[1], decay=aux[0],
                        warmup=aux[1]),
)
