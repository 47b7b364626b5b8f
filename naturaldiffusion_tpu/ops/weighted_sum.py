"""Fused weighted-sum over a buffer of cached tensors — the NI hot op.

At step k the engine computes ``out = sum_j w[j] * buf[j]`` where ``buf``
holds every past predicted x0 (resp. injected noise) and ``w`` is row k of the
coefficient matrix (reference inner loops:
``src/ValidateNaturalInference.py:198-204``,
``src/CIFAR10NaturalInference.py:233-238`` — fp64 python loops over a list).

TPU-native forms:

* ``weighted_sum_xla`` — a [1,n]x[n,M] contraction; XLA lowers it onto the
  MXU/VPU and fuses the cast.  Default path; for the small n typical of NI
  (5..28) this is already bandwidth-bound and near speed-of-light.

* ``weighted_sum_pallas`` — Pallas kernel that fuses BOTH buffers (x0 and
  eps) and the final add into one VMEM pass, and skips row-chunks that are
  entirely zero-weighted (rows > k are zero in the lower-triangular matrix),
  reading only the live prefix of the ring buffer from HBM.  This is the
  ``weighted_sum_ring`` kernel from SURVEY.md §7; it wins for large step
  counts (n >= ~64) where the O(n^2 M) buffer traffic dominates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def weighted_sum_xla(w, buf, accum_dtype=jnp.float32):
    """``sum_j w[j] * buf[j]`` with accumulation in ``accum_dtype``.

    ``w``: [n]; ``buf``: [n, ...] -> returns buf.shape[1:].
    """
    return jax.lax.dot_general(
        w.astype(accum_dtype).reshape(1, -1),
        buf.reshape(buf.shape[0], -1).astype(accum_dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=accum_dtype,
        # full-precision multiplies: the MXU default is bf16 for f32 inputs,
        # which costs ~3 decimal digits on the coefficient accumulation
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(buf.shape[1:])


# ---------------------------------------------------------------------------
# Pallas fused dual-buffer weighted sum
# ---------------------------------------------------------------------------

_ROW_CHUNK = 8        # sublane-aligned row chunk for f32
_LANE = 128


def _fused_kernel(nrow_ref, wx_ref, we_ref, bufx_ref, bufe_ref, out_ref):
    """out_tile = wx[:live] @ bufx[:live, tile] + we[:live_e] @ bufe[:live_e, tile].

    ``nrow_ref`` (SMEM, scalar-prefetched) holds the number of live rows in
    each buffer; whole zero-weight row chunks are skipped so only the lower-
    triangular prefix is ever touched.

    Weights are laid out ``[n, 1]`` so the dynamic chunk slice rides the
    *sublane* dimension (8-aligned offsets are statically provable); lane-dim
    dynamic slices would require 128-alignment and fail Mosaic compilation.
    """
    acc = jnp.zeros(out_ref.shape, dtype=jnp.float32)

    def accumulate(live, w_ref, buf_ref, acc):
        nchunks = buf_ref.shape[0] // _ROW_CHUNK

        def body(c, acc):
            # pin i32: under jax_enable_x64 python loop bounds trace as
            # i64 and Mosaic's scalar conversion recurses
            start = pl.multiple_of(
                (c * _ROW_CHUNK).astype(jnp.int32), _ROW_CHUNK)
            # whole-chunk predication: chunks past the live prefix cost nothing
            return jax.lax.cond(
                start < live,
                lambda a: a + jax.lax.dot_general(
                    w_ref[pl.ds(start, _ROW_CHUNK), :],
                    buf_ref[pl.ds(start, _ROW_CHUNK), :],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                ),
                lambda a: a,
                acc,
            )

        return jax.lax.fori_loop(jnp.int32(0), jnp.int32(nchunks), body,
                                 acc)

    acc = accumulate(nrow_ref[0], wx_ref, bufx_ref, acc)
    acc = accumulate(nrow_ref[1], we_ref, bufe_ref, acc)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def fused_weighted_sum_pallas(wx, we, bufx, bufe, live_x, live_e, tile=512,
                              interpret=False):
    """``wx @ bufx + we @ bufe``, skipping whole row chunks past ``live_*``.

    Shapes: ``wx`` [nx], ``we`` [ne], ``bufx`` [nx, M], ``bufe`` [ne, M] with
    nx, ne multiples of 8 and M a multiple of 128.  Returns [M] float32.

    CONTRACT: chunk skipping is whole-chunk (granularity ``_ROW_CHUNK``); rows
    beyond ``live_*`` inside the last live chunk are still multiplied, so the
    caller must guarantee ``w[live:] == 0``.  NI coefficient rows are lower-
    triangular, so this always holds; ``live_*`` is purely a compute-skipping
    hint and can be conservatively large (e.g. ``n``) without changing the
    result.
    """
    nx, m = bufx.shape
    ne = bufe.shape[0]
    assert nx % _ROW_CHUNK == 0 and ne % _ROW_CHUNK == 0, (nx, ne)
    assert m % _LANE == 0, m
    tile = min(tile, m)
    assert m % tile == 0, (m, tile)

    nrows = jnp.array([live_x, live_e], dtype=jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m // tile,),
        in_specs=[
            pl.BlockSpec((nx, 1), lambda i, n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ne, 1), lambda i, n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nx, tile), lambda i, n: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((ne, tile), lambda i, n: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile), lambda i, n: (0, i),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _fused_kernel,
        out_shape=jax.ShapeDtypeStruct((1, m), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * (nx + ne) * m,
            bytes_accessed=(nx + ne) * m * 4 + m * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(nrows, wx.astype(jnp.float32).reshape(nx, 1),
      we.astype(jnp.float32).reshape(ne, 1),
      bufx.astype(jnp.float32), bufe.astype(jnp.float32))
    return out.reshape(m)


def pad_rows(n: int, chunk: int = _ROW_CHUNK) -> int:
    return -(-n // chunk) * chunk


def pad_lanes(m: int, lane: int = _LANE) -> int:
    return -(-m // lane) * lane
