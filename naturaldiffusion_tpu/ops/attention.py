"""Multi-head attention dispatch: XLA einsum vs the Pallas TPU
flash-attention kernel.

The transformer backbones (DiT 1024 tokens, MMDiT 4096+context) are the
long-sequence hot path (SURVEY.md §5 long-context row).  ``backend="auto"``
picks the fused Pallas kernel (O(T) memory, no materialized [T, T] scores)
when running on TPU, and the plain einsum pair otherwise (CPU tests).

Unaligned sequence lengths — MMDiT's joint ``[latent; context]`` stream is
4096+154 for SD3-medium (``src/SD3NaturalInference.py:210-213``), never a
multiple of the kernel's 128-token tiles — are handled by zero-padding
q/k/v to the next tile boundary and masking the pad keys with segment ids
(pad tokens live in their own segment, so real queries never attend to
them); the pad query rows are sliced off afterwards.
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


def _flash(q, k, v, sm_scale: float, t: int):
    """Pallas flash attention, padding unaligned t up to 128-multiples."""
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    # pad to a 512-token tile: the kernel's throughput collapses at small
    # blocks (measured v5e, t=4096: 2.9ms @512, 7.0ms @256, 22.4ms @128),
    # so burning <=511 padded tokens beats shrinking the tile to fit
    unit = 512 if t >= 512 else 128
    tp = -(-t // unit) * unit
    if tp != t:
        pad = ((0, 0), (0, 0), (0, tp - t), (0, 0))
        q, k, v = (jnp.pad(a, pad) for a in (q, k, v))
        b = q.shape[0]
        # segment 0 = real tokens, 1 = padding; cross-segment attention is
        # masked, so pad keys contribute nothing to real queries
        seg = jnp.where(jnp.arange(tp) < t, 0, 1).astype(jnp.int32)
        seg = jnp.broadcast_to(seg[None], (b, tp))
        segment_ids = fa.SegmentIds(q=seg, kv=seg)
    else:
        segment_ids = None

    blk = min(512, tp)
    sizes = fa.BlockSizes(
        block_q=blk, block_k_major=blk,
        block_k=blk, block_b=1,
        block_q_major_dkv=blk, block_k_major_dkv=blk,
        block_q_dkv=blk, block_k_dkv=blk,
        block_q_dq=blk, block_k_dq=blk,
        block_k_major_dq=blk)
    out = fa.flash_attention(q, k, v, causal=False, sm_scale=sm_scale,
                             segment_ids=segment_ids, block_sizes=sizes)
    return out[:, :, :t] if tp != t else out


def _splash(q, k, v, sm_scale: float, t: int, block_q: int = 512,
            block_kv: int = 512, interpret: bool = False):
    """Splash attention (the newer TPU kernel generation): grid over heads
    with q pre-scaled, 128-token tile granularity (vs the legacy kernel's
    512 sweet spot), full bwd block spec so training works too."""
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk, splash_attention_mask as sm_lib)

    b, h, _, d = q.shape
    # pad to the block unit (the mask-info builder requires block_q | seq);
    # like the flash path, burning pad tokens beats shrinking the block
    unit = block_q if t >= block_q else 128
    tp = -(-t // unit) * unit
    if tp != t:
        pad = ((0, 0), (0, 0), (0, tp - t), (0, 0))
        q, k, v = (jnp.pad(a, pad) for a in (q, k, v))
        # pad tokens live in segment 1; real queries never see them
        seg = jnp.where(jnp.arange(tp) < t, 0, 1).astype(jnp.int32)
        segment_ids = sk.SegmentIds(q=seg, kv=seg)
    else:
        segment_ids = None

    bq, bkv = min(block_q, tp), min(block_kv, tp)
    sizes = sk.BlockSizes(
        block_q=bq, block_kv=bkv, block_kv_compute=bkv,
        block_q_dkv=bq, block_kv_dkv=bkv, block_kv_dkv_compute=bkv,
        block_q_dq=bq, block_kv_dq=bkv)
    kernel = sk.make_splash_mha_single_device(
        mask=sm_lib.MultiHeadMask([sm_lib.FullMask((tp, tp))] * h),
        block_sizes=sizes, interpret=interpret)
    qs = (q * sm_scale).astype(q.dtype)   # splash takes pre-scaled q
    out = jax.vmap(
        lambda qq, kk, vv: kernel(qq, kk, vv, segment_ids=segment_ids)
    )(qs, k, v)
    return out[:, :, :t] if tp != t else out


def mha(q, k, v, *, backend: str = "auto", sm_scale: float | None = None,
        mesh=None, ring_axis: str = "model"):
    """q/k/v: [B, H, T, D] -> [B, H, T, D].

    ``backend="ring"``: sequence-parallel ring attention — K/V stay sharded
    over ``mesh``'s ``ring_axis`` and rotate via ``ppermute``
    (:mod:`.ring_attention`).  Requires ``T % mesh.shape[ring_axis] == 0``.
    Crossover vs the all-gather path: ring wins once the *sharded* K/V no
    longer fit (or their all-gather no longer overlaps) — per-chip peak
    memory is O(T/n) vs O(T); at DiT/MMDiT's <=4.5k tokens the all-gather
    is faster, so "auto" never picks ring — it is the explicit long-context
    backend (SURVEY §2.5 SP row)."""
    d = q.shape[-1]
    sm_scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(d)
    t = q.shape[2]

    if backend == "auto":
        # the kernel tiles sequences at 128/512 granularity and pads odd
        # head dims internally (verified on v5e with d=64/72: ~2x over the
        # einsum pair at 4096 tokens); unaligned lengths are padded+masked
        backend = "flash" if (_on_tpu() and t >= 256) else "xla"

    if backend == "ring":
        from .ring_attention import ring_mha
        if mesh is None:
            raise ValueError("backend='ring' needs mesh=")
        return ring_mha(q, k, v, mesh, axis=ring_axis, sm_scale=sm_scale)

    if backend == "flash":
        return _flash(q, k, v, sm_scale, t)

    if backend in ("splash", "splash_interpret"):
        return _splash(q, k, v, sm_scale, t,
                       interpret=backend == "splash_interpret")

    if backend == "xla":
        attn = jnp.einsum("bhqc,bhkc->bhqk", q, k) * sm_scale
        attn = jax.nn.softmax(attn, axis=-1)
        return jnp.einsum("bhqk,bhkc->bhqc", attn, v)

    raise ValueError(backend)
