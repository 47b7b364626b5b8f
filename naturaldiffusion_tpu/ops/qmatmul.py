"""Weight-only-int8 matmul Pallas kernel (W8A16) for weight-read-bound
transformer inference.

Why: DiT-XL/2's bench step runs at CFG batch 2 (512 tokens), where the
per-step time is dominated by READING ~0.9 GB of in-loop bf16 weights, not
by MXU FLOPs (PERF.md "DiT-XL/2" section).  The W8A8 conv path's lesson
doesn't transfer — int8 *compute* through XLA only buys 1.25× — but int8
*storage* halves the weight bytes, which is the binding resource here.
XLA cannot express this inside a scan: a `w_i8.astype(bf16) * s` dequant
on loop-invariant weights is hoisted by LICM and materializes the bf16
weights once, destroying the saving.  A Pallas kernel that consumes int8
weights directly and dequantizes per-tile in VMEM is the only formulation
that actually moves half the bytes.

Numerics: int8 values are exactly representable in bf16 (8-bit mantissa),
so `dot(x_bf16, w_i8→bf16)` with f32 accumulation followed by the
per-column scale is bitwise equal to dot(x, w_i8 * s) in the same
precision — the only approximation is the weight quantization itself
(per-output-channel, same scheme as ops/quant.py).

Dispatch: ``NATDIFF_QUANT=w8`` via :class:`models.dit.QDense`.  A/B and
accuracy artifacts: results/perf_r5/.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _pick_block(total: int, candidates) -> int | None:
    for c in candidates:
        if total % c == 0:
            return c
    return None


def qmatmul_ok(m: int, k: int, n: int) -> bool:
    """Shape gate: lane/sublane-aligned and VMEM-block-tileable."""
    return (k % 128 == 0 and _pick_block(n, (512, 256, 128)) is not None
            and _pick_block(m, (256, 128, 64, 32, 16)) is not None
            and k <= 8192)


def _kern(x_ref, w_ref, s_ref, b_ref, o_ref):
    w = w_ref[:].astype(jnp.bfloat16)           # exact: |int8| < 2^8
    acc = jnp.dot(x_ref[:].astype(jnp.bfloat16), w,
                  preferred_element_type=jnp.float32)
    acc = acc * s_ref[:].astype(jnp.float32)    # [1, bn] per-column scale
    if b_ref is not None:
        acc = acc + b_ref[:].astype(jnp.float32)
    o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _call(x2, w_i8, s_w, bias, interpret=False):
    m, k = x2.shape
    n = w_i8.shape[1]
    bm = _pick_block(m, (256, 128, 64, 32, 16))
    bn = _pick_block(n, (512, 256, 128))
    kern = _kern if bias is not None else (
        lambda x_ref, w_ref, s_ref, o_ref: _kern(x_ref, w_ref, s_ref,
                                                 None, o_ref))
    in_specs = [pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
                pl.BlockSpec((k, bn), lambda i, j: (0, j)),
                pl.BlockSpec((1, bn), lambda i, j: (0, j))]
    args = [x2, w_i8, s_w.reshape(1, n)]
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, bn), lambda i, j: (0, j)))
        args.append(bias.reshape(1, n))
    return pl.pallas_call(
        kern,
        grid=(m // bm, n // bn),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), x2.dtype),
        interpret=interpret,
    )(*args)


def matmul_wdq(x, w_i8, s_w, bias=None, *, interpret=None):
    """``x [..., K] @ dequant(w_i8 [K, N], s_w [N]) (+ bias)`` -> [..., N].

    ``x`` any float dtype (computed in bf16, f32 accumulation, output in
    x.dtype); ``w_i8`` int8; ``s_w`` f32 per-output-channel scales.
    """
    k = x.shape[-1]
    n = w_i8.shape[1]
    m = 1
    for d in x.shape[:-1]:
        m *= d
    if not qmatmul_ok(m, k, n):
        raise ValueError(f"matmul_wdq shape gate failed for M={m} K={k} "
                         f"N={n} (caller must pre-check qmatmul_ok)")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out = _call(x.reshape(m, k), w_i8,
                jnp.asarray(s_w, jnp.float32).reshape(-1),
                None if bias is None else jnp.asarray(bias),
                interpret=interpret)
    return out.reshape(*x.shape[:-1], n)
