"""Multi-head attention dispatch: XLA einsum vs the Pallas TPU
flash-attention kernel.

The transformer backbones (DiT 1024 tokens, MMDiT 4096+context) are the
long-sequence hot path (SURVEY.md §5 long-context row).  ``backend="auto"``
picks the fused Pallas kernel (O(T) memory, no materialized [T, T] scores)
when running on TPU with block-aligned sequence lengths, and the plain
einsum pair otherwise (CPU tests, odd lengths).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def mha(q, k, v, *, backend: str = "auto", sm_scale: float | None = None):
    """q/k/v: [B, H, T, D] -> [B, H, T, D]."""
    d = q.shape[-1]
    sm_scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(d)
    t = q.shape[2]

    if backend == "auto":
        # the kernel tiles sequences at 128/512 granularity and pads odd
        # head dims internally (verified on v5e with d=64/72: ~2x over the
        # einsum pair at 4096 tokens); unaligned sequence lengths (e.g.
        # MMDiT latent+context joints) fall back to the einsum pair
        backend = "flash" if (_on_tpu() and t % 128 == 0
                              and t >= 256) else "xla"

    if backend == "flash":
        from jax.experimental.pallas.ops.tpu import flash_attention as fa
        sizes = fa.BlockSizes(
            block_q=min(512, t), block_k_major=min(512, t),
            block_k=min(512, t), block_b=1,
            block_q_major_dkv=min(512, t), block_k_major_dkv=min(512, t),
            block_q_dkv=min(512, t), block_k_dkv=min(512, t),
            block_q_dq=min(512, t), block_k_dq=min(512, t),
            block_k_major_dq=min(512, t))
        return fa.flash_attention(q, k, v, causal=False, sm_scale=sm_scale,
                                  block_sizes=sizes)

    if backend == "xla":
        attn = jnp.einsum("bhqc,bhkc->bhqk", q, k) * sm_scale
        attn = jax.nn.softmax(attn, axis=-1)
        return jnp.einsum("bhqk,bhkc->bhqc", attn, v)

    raise ValueError(backend)
