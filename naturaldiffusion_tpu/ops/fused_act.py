"""Fused bias-add + (leaky)ReLU — TPU equivalent of the reference CUDA
extension (``deps/score_sde_pytorch/op/fused_bias_act_kernel.cu:18-98``,
Python wrappers ``op/fused_act.py:20-123``).

Semantics: ``out = scale * leaky_relu(x + bias)`` with ``negative_slope=0.2``
and ``scale=sqrt(2)`` (StyleGAN2 convention).

Two paths:

* ``fused_leaky_relu`` — plain jnp; XLA fuses the bias broadcast, add, select
  and scale into one VPU loop (and into the producing matmul's epilogue when
  possible).  This is the default: on TPU there is nothing left to win for an
  elementwise chain, which is exactly why the CUDA kernel does not need a
  hand-written twin here.
* ``fused_leaky_relu_pallas`` — explicit single-pass Pallas kernel, kept to
  (a) pin the fusion when XLA's scheduling misses it inside large graphs and
  (b) serve as the template for fused epilogues in custom kernels.

Autodiff: plain jnp is differentiated by JAX (incl. double-backward) — the
reference needed three hand-written CUDA variants (act*10+grad switch) for
fwd/bwd/double-bwd; here they come for free.

Wiring note: in the reference itself NO model imports this op — only
``op/__init__.py`` re-exports it (``grep FusedLeakyReLU models/`` is empty;
it is StyleGAN2 vendor code carried along by score_sde).  The NCSN++ FIR
path uses plain ``silu``.  This port matches that surface: implemented,
tested, exported — and deliberately not spliced into a forward path the
reference never used it in.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SQRT2 = 1.4142135623730951


def fused_leaky_relu(x, bias=None, negative_slope: float = 0.2,
                     scale: float = SQRT2):
    """``scale * leaky_relu(x + bias)``; bias broadcast over the channel
    (last) axis.  NHWC layout — the reference broadcasts over dim 1 (NCHW)."""
    if bias is not None:
        x = x + bias.reshape((1,) * (x.ndim - 1) + (-1,)).astype(x.dtype)
    return jnp.where(x >= 0, x, negative_slope * x) * scale


def _flr_kernel(x_ref, b_ref, o_ref, *, negative_slope, scale):
    x = x_ref[:] + b_ref[:]
    o_ref[:] = jnp.where(x >= 0, x, negative_slope * x) * scale


@functools.partial(jax.jit, static_argnames=("negative_slope", "scale",
                                             "interpret"))
def fused_leaky_relu_pallas(x, bias, negative_slope: float = 0.2,
                            scale: float = SQRT2, interpret: bool = False):
    """Single-VMEM-pass fused kernel; ``x``: [..., C], ``bias``: [C]."""
    shape = x.shape
    c = shape[-1]
    x2 = x.reshape(-1, c)
    m = x2.shape[0]
    row_tile = min(m, 512)
    # pad rows so the grid divides evenly (cheap: one extra tile at most)
    m_pad = -(-m // row_tile) * row_tile
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_flr_kernel, negative_slope=negative_slope,
                          scale=scale),
        out_shape=jax.ShapeDtypeStruct((m_pad, c), x.dtype),
        grid=(m_pad // row_tile,),
        in_specs=[
            pl.BlockSpec((row_tile, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_tile, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, bias.reshape(1, c).astype(x.dtype))
    return out[:m].reshape(shape)
