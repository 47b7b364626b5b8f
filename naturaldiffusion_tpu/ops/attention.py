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


def mha_joint(q, k, v, *, split: int, sm_scale: float | None = None,
              backend: str = "auto", block: int = 512,
              interpret: bool = False):
    """Joint ``[latent; context]`` attention with NO kernel padding.

    MMDiT's joint stream is ``t_latent + t_ctx`` tokens (4096+154 for
    SD3-medium at 1024px, ``src/SD3NaturalInference.py:210-213``) — never a
    multiple of the kernel's tile, so the plain :func:`mha` path pads q/k/v
    to 4608 and masks with segment ids (+17.5% scores).  The latent block
    alone IS tile-aligned (4096 = 8x512), so this op splits the softmax
    instead of padding:

    * latent q x latent kv  — splash kernel, unpadded, ``save_residuals``
      returns the row logsumexp;
    * latent q x context kv — tiny einsum (154 keys), merged with the
      kernel block via the standard two-way logsumexp combine;
    * context q x ALL kv    — one tiny einsum row-softmax (154 queries).

    **Measured result (v5e, r3): the padded path WINS in-model** — SD3-1024
    went 5.31 -> 6.58 s/img with this op wired into the JointBlock, and the
    op-level A/B at [2,24,4250,64] bf16 reads 6.1 ms (padded flash) vs
    8.6 ms (this).  Mechanism: the flash/splash kernels are VPU-bound at
    these shapes (~40 TFLOP/s; the softmax exps, not the MXU, are the
    bottleneck), so masked pad keys cost only ~9% extra exps, while the
    split costs three q/k/v slice copies (layout copies on [B,H,T,D]) plus
    an f32 score pipeline for the context pieces.  Rectangular kernels
    (q=4096 x kv=4608, block 512) measured 6.27-6.30 ms — also no win.
    Kept as a tested, explicitly-selectable alternative: the economics
    flip when ``t_ctx`` is large relative to the pad waste or when the
    latent block is big enough that O(T^2) pad scores dominate the O(T*tc)
    einsum pieces.

    Falls back to :func:`mha` off-TPU, for ``backend="xla"``, or when
    ``split`` is not tile-aligned.  ``split`` must be static.
    """
    d = q.shape[-1]
    sm_scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(d)
    t = q.shape[2]
    t_ctx = t - split

    fast = ((_on_tpu() or interpret) and backend != "xla"
            and t_ctx > 0 and split >= block and split % block == 0)
    if not fast:
        return mha(q, k, v, backend=backend, sm_scale=sm_scale)

    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk, splash_attention_mask as sm_lib)

    h = q.shape[1]
    qs = (q * sm_scale).astype(q.dtype)        # splash takes pre-scaled q
    q_lat, q_ctx = qs[:, :, :split], qs[:, :, split:]
    k_lat, k_ctx = k[:, :, :split], k[:, :, split:]
    v_lat, v_ctx = v[:, :, :split], v[:, :, split:]

    sizes = sk.BlockSizes(
        block_q=block, block_kv=block, block_kv_compute=block,
        block_q_dkv=block, block_kv_dkv=block, block_kv_dkv_compute=block,
        block_q_dq=block, block_kv_dq=block)
    kernel = sk.make_splash_mha_single_device(
        mask=sm_lib.MultiHeadMask([sm_lib.FullMask((split, split))] * h),
        block_sizes=sizes, save_residuals=True, interpret=interpret)
    out_ll, lse_ll = jax.vmap(
        lambda qq, kk, vv: kernel(qq, kk, vv))(q_lat, k_lat, v_lat)
    lse_ll = lse_ll[0]                          # [B, H, split]

    # latent q x context kv: 154-key einsum, f32 softmax pieces
    s_lc = jnp.einsum("bhqc,bhkc->bhqk", q_lat, k_ctx,
                      preferred_element_type=jnp.float32)
    m_lc = s_lc.max(axis=-1)
    e_lc = jnp.exp(s_lc - m_lc[..., None])
    l_lc = e_lc.sum(axis=-1)
    lse_lc = m_lc + jnp.log(l_lc)
    out_lc = jnp.einsum("bhqk,bhkc->bhqc", e_lc.astype(v.dtype), v_ctx)

    # two-way logsumexp merge (out_ll is normalized; out_lc is raw exp sums)
    lse = jnp.logaddexp(lse_ll, lse_lc)
    w_ll = jnp.exp(lse_ll - lse)
    w_lc = jnp.exp(lse_lc - lse) / l_lc
    out_lat = (out_ll.astype(jnp.float32) * w_ll[..., None]
               + out_lc.astype(jnp.float32) * w_lc[..., None])

    # context queries: one tiny full-row softmax over all t keys
    s_c = jnp.einsum("bhqc,bhkc->bhqk", q_ctx, k,
                     preferred_element_type=jnp.float32)
    out_c = jnp.einsum("bhqk,bhkc->bhqc",
                       jax.nn.softmax(s_c, axis=-1).astype(v.dtype), v)

    return jnp.concatenate(
        [out_lat.astype(q.dtype), out_c.astype(q.dtype)], axis=2)
