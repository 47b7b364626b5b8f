"""Fused GroupNorm for the UNet hot path (stats + normalize + optional
per-sample channel bias + optional SiLU in ONE VMEM pass).

Motivation (measured, see ``bench.py`` / COVERAGE.md): on the CIFAR-10 NCSN++
forward, XLA lowers each GroupNorm into a standalone ``convert_reduce_fusion``
statistics pass running at 100–350 GB/s — ~50% of device time at batch 512.
The reference hits the same wall differently: its GroupNorm is a stock torch
op around the hand-written CUDA elementwise kernels
(``deps/score_sde_pytorch/models/normalization.py``).

This kernel streams each (sub-)batch block through VMEM once: per-channel
sums on the VPU (lane-aligned, C is a multiple of 128 in every NCSN++
config), a tiny per-group reduction, then the normalize/affine/SiLU epilogue
on the same resident block.  Traffic = read x + write y, the speed of light
for an un-fused GN.

The ``extra_bias`` input fuses the resblock's ``h + Dense(temb)[:, None,
None, :]`` into the same pass (``layerspp.py:190-200`` in the reference),
saving one full read+write of the activation tensor per resblock.

Numerics: statistics and the affine epilogue in f32 (matching flax
``nn.GroupNorm``'s fast-variance formula), output cast to ``x.dtype``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-block VMEM budget (bytes) for the activation tile; x2 for in+out and
# x2 again for double buffering still fits comfortably in 16MB VMEM
_BLOCK_BUDGET = 2 * 1024 * 1024


def _apply_act(y, act):
    if act is None:
        return y
    if act == "silu":
        return y * jax.nn.sigmoid(y)
    raise ValueError(f"unsupported act: {act}")


def group_norm_reference(x, scale, bias, num_groups: int, eps: float = 1e-6,
                         act: str | None = None, extra_bias=None):
    """Pure-jnp twin of the kernel (flax ``nn.GroupNorm`` fast-variance
    numerics).  Used on non-TPU backends and as the test oracle."""
    b, h, w, c = x.shape
    gs = c // num_groups
    xf = x.astype(jnp.float32)
    if extra_bias is not None:
        xf = xf + extra_bias.astype(jnp.float32)[:, None, None, :]
    g = xf.reshape(b, h, w, num_groups, gs)
    mu = jnp.mean(g, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(g * g, axis=(1, 2, 4), keepdims=True) - mu * mu
    yn = (g - mu) * jax.lax.rsqrt(var + eps)
    y = (yn.reshape(b, h, w, c) * scale.astype(jnp.float32)
         + bias.astype(jnp.float32))
    return _apply_act(y, act).astype(x.dtype)


def _gn_kernel(x_ref, scale_ref, bias_ref, o_ref, *, num_groups, eps, act):
    _gn_body(x_ref, None, scale_ref, bias_ref, o_ref,
             num_groups=num_groups, eps=eps, act=act)


def _gn_kernel_eb(x_ref, eb_ref, scale_ref, bias_ref, o_ref, *, num_groups,
                  eps, act):
    _gn_body(x_ref, eb_ref, scale_ref, bias_ref, o_ref,
             num_groups=num_groups, eps=eps, act=act)


def _gn_body(x_ref, eb_ref, scale_ref, bias_ref, o_ref, *, num_groups, eps,
             act):
    bt, h, w, c = x_ref.shape
    gs = c // num_groups
    n = h * w * gs
    x = x_ref[:].astype(jnp.float32).reshape(bt, h * w, c)
    if eb_ref is not None:
        x = x + eb_ref[:].astype(jnp.float32).reshape(bt, 1, c)
    # per-channel sums over the spatial axis (lane axis C stays intact)
    s = jnp.sum(x, axis=1)                                   # (Bt, C)
    s2 = jnp.sum(x * x, axis=1)                              # (Bt, C)
    # per-group fold + broadcast back as two tiny matmuls: Mosaic cannot
    # shape-cast lanes (C)->(G, gs), but (Bt,C)@(C,G) / (Bt,G)@(G,C) with
    # iota-built 0/1 matrices vectorize cleanly
    cg = (jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0) // gs ==
          jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
          ).astype(jnp.float32)                              # gather  (C, G)
    gc = (jax.lax.broadcasted_iota(jnp.int32, (num_groups, c), 1) // gs ==
          jax.lax.broadcasted_iota(jnp.int32, (num_groups, c), 0)
          ).astype(jnp.float32)                              # scatter (G, C)
    # precision=HIGHEST: the v5e MXU lowers f32 dots to bf16 multiplies by
    # default — 3e-3 relative error on the folded statistics (caught by the
    # on-hardware drive check)
    hi = jax.lax.Precision.HIGHEST
    sg = jnp.dot(s, cg, preferred_element_type=jnp.float32,
                 precision=hi)                               # (Bt, G)
    s2g = jnp.dot(s2, cg, preferred_element_type=jnp.float32, precision=hi)
    mu = sg / n
    var = s2g / n - mu * mu
    inv = jax.lax.rsqrt(var + eps)
    mu_c = jnp.dot(mu, gc, preferred_element_type=jnp.float32,
                   precision=hi)                             # (Bt, C)
    inv_c = jnp.dot(inv, gc, preferred_element_type=jnp.float32, precision=hi)
    w_c = inv_c * scale_ref[:].astype(jnp.float32)           # (Bt, C)
    b_c = bias_ref[:].astype(jnp.float32) - mu_c * inv_c * \
        scale_ref[:].astype(jnp.float32)
    y = x * w_c[:, None, :] + b_c[:, None, :]
    y = _apply_act(y, act)
    o_ref[:] = y.astype(o_ref.dtype).reshape(bt, h, w, c)


def _block_batch(b: int, per_sample_bytes: int) -> int:
    bt = max(1, _BLOCK_BUDGET // max(per_sample_bytes, 1))
    # largest divisor of b not exceeding bt
    bt = min(bt, b)
    while b % bt:
        bt -= 1
    return bt


def group_norm_pallas(x, scale, bias, num_groups: int, eps: float = 1e-6,
                      act: str | None = None, extra_bias=None,
                      interpret: bool = False):
    """Fused GN kernel.  ``x``: [B, H, W, C]; ``scale``/``bias``: [C];
    ``extra_bias``: optional [B, C] added to x (broadcast over H, W) before
    the statistics — the resblock temb projection."""
    b, h, w, c = x.shape
    assert c % num_groups == 0, (c, num_groups)
    bt = _block_batch(b, h * w * c * x.dtype.itemsize)
    grid = (b // bt,)
    kernel = _gn_kernel_eb if extra_bias is not None else _gn_kernel
    in_specs = [
        pl.BlockSpec((bt, h, w, c), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [x]
    if extra_bias is not None:
        # (B, 1, C) so the block's trailing dims equal the array dims
        # (Mosaic requires trailing block dims %8/%128 or full-size)
        in_specs.append(pl.BlockSpec((bt, 1, c), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(extra_bias.reshape(b, 1, c))
    in_specs += [
        pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args += [scale.reshape(1, c), bias.reshape(1, c)]
    return pl.pallas_call(
        functools.partial(kernel, num_groups=num_groups, eps=eps, act=act),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bt, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)


def _eligible(x, num_groups: int) -> bool:
    if x.ndim != 4:
        return False
    c = x.shape[-1]
    if c % num_groups or c % 128:
        return False
    # a single sample must fit the block budget (true for <=64x64 UNet
    # feature maps; celebahq-256 level-0 maps fall back to XLA)
    return x.shape[1] * x.shape[2] * c * x.dtype.itemsize <= _BLOCK_BUDGET


import os

# Measured on v5e (batch-512 NCSN++ forward): XLA fuses the GN statistics
# into the *producing* conv's epilogue wherever the producer is a conv, and
# its layout assignment keeps activations batch-minor ({0,3,2,1}) for the
# convs.  A Pallas GN forces default-layout operands, so XLA inserts two
# full-tensor layout copies around every call — the kernel wins in isolation
# (0.57ms vs 0.94ms at [512,32,32,128]) but loses in-model (0.182s vs 0.146s
# per forward).  Default therefore = XLA formulation; the kernel stays
# available for standard-layout callers via NATDIFF_PALLAS_GN=1.
def _force_pallas() -> bool:
    # read per call (trace time), like the conv3x3 flags, so one process
    # can A/B both paths (monkeypatch tests, in-process bench sweeps)
    return os.environ.get("NATDIFF_PALLAS_GN", "") == "1"
# statistics formulation for the XLA path: "5d" reduces the (B,H,W,G,gs)
# view over (1,2,4) in one shot; "channel" does per-channel spatial sums
# first (C lanes intact — the vectorization-friendly shape) and folds the
# tiny [B,C] result per group on the side
def _stats_mode() -> str:
    return os.environ.get("NATDIFF_GN_STATS", "channel")
# Producer-fusion barrier.  Measured bench.py A/B (v5e, micro=64, r3):
#   barrier=1 stats=5d      698.0 img/s   (the r2 configuration)
#   barrier=1 stats=channel 698.5         (formulation alone: a wash)
#   barrier=0 stats=5d      554.4         (group-axis reduce in the conv
#                                          epilogue wrecks the conv schedule
#                                          — the r2 finding that motivated
#                                          the barrier)
#   barrier=0 stats=channel 736.9         (per-channel spatial sums fuse
#                                          into the conv epilogue for FREE:
#                                          no separate stats pass at all)
# => the stats pass only needed splitting because of HOW it reduced; with
# C kept on the lanes the epilogue fusion is free and the barrier is pure
# loss.  Default: no barrier for "channel", barrier for "5d".
def _use_barrier() -> bool:
    return os.environ.get(
        "NATDIFF_GN_BARRIER",
        "0" if _stats_mode() == "channel" else "1") == "1"


def group_norm_xla_channel(x, scale, bias, num_groups: int,
                           eps: float = 1e-6, act: str | None = None):
    """Two-stage GN statistics: spatial-only reduces keep the channel axis
    as the minor (lane) axis, so the stats pass vectorizes over C instead
    of striding through the (B,H,W,G,gs) view.  Same fast-variance math as
    :func:`group_norm_reference` up to f32 summation order."""
    _, h, w, _ = x.shape
    # one shared implementation of the group-fold / fast-variance / affine
    # collapse (gn_affine_coeffs below) — the fused-resblock path consumes
    # the identical coefficients, so numerics fixes land in one place
    s1, s2 = gn_channel_sums(x)
    w_c, b_c = gn_affine_coeffs(s1, s2, h * w, scale, bias, num_groups,
                                eps=eps)
    y = x.astype(jnp.float32) * w_c[:, None, None, :] + b_c[:, None, None, :]
    return _apply_act(y, act).astype(x.dtype)


def gn_channel_sums(x):
    """Per-(sample,channel) spatial sums ``(s1, s2)`` f32 ``[B, C]`` — the
    statistics input to :func:`gn_affine_coeffs`.  As an XLA reduce this
    fuses into whatever produced ``x``; the fused conv kernel
    (``ops.conv3x3.conv3x3_gn_pallas(emit_stats=True)``) emits the same
    sums from its resident f32 accumulator."""
    xf = x.astype(jnp.float32)
    return jnp.sum(xf, axis=(1, 2)), jnp.sum(xf * xf, axis=(1, 2))


def gn_affine_coeffs(s1, s2, n_spatial: int, scale, bias, num_groups: int,
                     eps: float = 1e-6, extra_bias=None):
    """Collapse GroupNorm(+ optional per-(sample,channel) ``extra_bias``)
    into per-channel affine scalars ``(w_c, b_c)`` f32 ``[B, C]`` such that
    ``GN(x + tb) == x * w_c + b_c`` — consumable by the fused conv kernel's
    prologue or one XLA mul-add.

    ``s1/s2`` are the channel sums of ``x`` (NOT of ``x+tb``); the bias
    enters algebraically: ``s1' = s1 + n*tb``, ``s2' = s2 + 2*tb*s1 +
    n*tb**2`` — zero activation traffic.  Same fast-variance f32 math as
    :func:`group_norm_reference`."""
    b, c = s1.shape
    gs = c // num_groups
    n = n_spatial * gs
    s1 = s1.astype(jnp.float32)
    s2 = s2.astype(jnp.float32)
    if extra_bias is not None:
        tb = jnp.broadcast_to(extra_bias.astype(jnp.float32), (b, c))
        s2 = s2 + 2.0 * tb * s1 + n_spatial * tb * tb
        s1 = s1 + n_spatial * tb
    sg = s1.reshape(b, num_groups, gs).sum(-1)
    s2g = s2.reshape(b, num_groups, gs).sum(-1)
    mu = sg / n
    var = s2g / n - mu * mu
    inv = jax.lax.rsqrt(var + eps)
    inv_c = jnp.repeat(inv, gs, axis=1)
    mu_c = jnp.repeat(mu, gs, axis=1)
    w_c = inv_c * scale.astype(jnp.float32)
    b_c = bias.astype(jnp.float32) - mu_c * w_c
    if extra_bias is not None:
        # the kernel prologue applies x*w_c + b_c to the RAW x; fold the
        # tb shift in: (x + tb - mu)*inv*scale + bias
        b_c = b_c + tb * w_c
    return w_c, b_c


def fused_group_norm(x, scale, bias, num_groups: int, eps: float = 1e-6,
                     act: str | None = None, extra_bias=None):
    """Dispatcher: XLA formulation by default (see note above); Pallas kernel
    when NATDIFF_PALLAS_GN=1 and the shape is eligible.

    Default TPU path (r3): per-channel "channel" statistics with NO
    producer barrier — the spatial-only reduce fuses into the producing
    conv's epilogue at full MXU rate, so the statistics cost nothing
    (736.9 vs 698.0 img/s whole-model, A/B table above).  The r2
    barrier+5d configuration remains reachable via NATDIFF_GN_STATS=5d
    (there the group-axis reduce in the epilogue halves the conv's MXU
    rate — 75 vs 142 TFLOP/s on the batch-512 level-0 conv — and the
    barrier is a ~6% win)."""
    if (_force_pallas() and jax.default_backend() == "tpu"
            and _eligible(x, num_groups)):
        if extra_bias is not None and extra_bias.shape[0] != x.shape[0]:
            # schedule-hoisted temb projections arrive [1, C]; the kernel's
            # block spec wants a real batch row per block
            extra_bias = jnp.broadcast_to(
                extra_bias, (x.shape[0], extra_bias.shape[-1]))
        return group_norm_pallas(x, scale, bias, num_groups, eps=eps,
                                 act=act, extra_bias=extra_bias)
    if extra_bias is not None:
        # fold the temb projection into the producer fusion, not the GN
        x = x + extra_bias.astype(x.dtype)[:, None, None, :]
    if jax.default_backend() == "tpu":
        if _use_barrier():
            x = jax.lax.optimization_barrier(x)
        if _stats_mode() == "channel":
            return group_norm_xla_channel(x, scale, bias, num_groups,
                                          eps=eps, act=act)
    return group_norm_reference(x, scale, bias, num_groups, eps=eps, act=act)
