"""Int8 (W8A8) quantized convolution path for TPU inference.

Why this exists (VERDICT r4 → r5 task 1): the CIFAR-10 NCSN++ headline bench
sits at 738 img/s = 94.5% of the v5e *bf16* roofline (PERF.md), so the only
honest route to the >1000 img/s target is changing the peak itself.  The v5e
MXU runs int8 x int8 -> int32 at ~2x the bf16 rate (394 vs 197 TOP/s), so a
W8A8 conv path lifts the model's compute ceiling to ~2x — if XLA actually
schedules s8 convs at MXU int8 rate and the quantize/dequantize elementwise
riders stay fused.  Both are measured, not assumed:
``apps/bench_quant_ops.py`` (per-op) and ``BENCH_QUANT=int8 python bench.py``
(in-model) A/B on the chip.

Scheme (standard post-training quantization, cf. Q-Diffusion-style W8A8):
  * weights: static symmetric per-output-channel scales,
    ``s_w[co] = max|w[..., co]| / 127``.  Computed in-graph from the bf16
    params — the param tree, checkpoints, and converters are untouched; under
    ``jit`` the quantization is loop-invariant (weights are constants across
    NI steps) so XLA's LICM hoists it out of the step loop.
  * activations: dynamic symmetric per-sample scales,
    ``s_x[b] = max|x[b]| / 127`` — conv is linear per sample, so the exact
    dequant is ``y[b,...,co] = conv_i32[b,...,co] * s_x[b] * s_w[co]``.
    Dynamic scales need no calibration data and track the NI trajectory's
    moving activation range across steps.
  * accumulation in int32, dequant + bias in f32, output cast back to the
    activation dtype.

Reference workload this accelerates: ``src/CIFAR10NaturalInference.py:294-304``
(the 10-step NI FID sweep forward).  The reference has no quantized path —
this is a TPU-native capability on top of parity.

Accuracy is bounded with in-repo tools (tests/test_quant.py): trajectory MAE
vs the fp64 oracle and the roundtrip-W1 delta at 10-step NI.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# keep a margin below 127 so the int32 accumulator cannot saturate even at
# the largest hot shape: 3*3*512 * 127 * 127 ~ 7.4e7 << 2^31, so 127 is in
# fact safe for every NCSN++ conv — full range retained.
_QMAX = 127.0


def quant_enabled() -> str | None:
    """Read per call (trace time), like the Pallas conv flags.  Values:

    * ``int8`` — W8A8 on the lane-aligned 3x3 resblock convs (the measured
      winner: 811.6 vs 740.2 img/s on the r5 chip A/B,
      results/perf_r5/bench_int8.json vs bench_control.json).
    * ``int8_all`` — additionally quantize the 1x1 shortcuts and attention
      NINs.  Measured LOSER on chip (744.4 img/s, bench_int8_wide.json):
      the [B,HW,C] int8 dots plus their quant/dequant riders cost more than
      the bf16 einsums they replace at these shapes — kept opt-in per the
      repo's documented-revert convention (like the Pallas conv ladder).
    * ``int8_static`` — int8 with a compile-time activation clip
      (:func:`static_amax`) instead of the dynamic per-sample amax pass;
      the r5 measured WINNER: 1034.5 img/s vs 811.6 dynamic / 740.2 bf16
      (results/perf_r5/bench_int8_static.json) — with a constant scale the
      quantize clamp and the dequant multiply fold into neighbouring
      fusions instead of standing as data-dependent passes.
    * ``int8_all_static`` — static scheme extended to the 1x1 shortcuts and
      attention NINs.  The *dynamic* wide mode lost on the riders
      (bench_int8_wide.json); static deletes exactly those riders, so the
      wide question gets re-asked at the better operating point.
    * ``w8`` (handled by ``models.dit.QDense``, not the conv path) —
      weight-only int8 via the Pallas dequant matmul (ops/qmatmul.py) for
      the weight-read-bound transformer steps.

    TRAP: jit's trace cache is keyed on function identity, not this env var —
    flipping the flag and re-jitting the SAME function object silently reuses
    the old trace.  A/B within one process must jit a fresh function object
    per mode (apps/quant_accuracy.py pattern); across processes the bench.py
    one-env-per-process pattern is immune."""
    v = os.environ.get("NATDIFF_QUANT", "")
    return (v if v in ("int8", "int8_all", "int8_static", "int8_all_static")
            else None)


def static_amax() -> float:
    """Activation clip range for ``int8_static`` (``NATDIFF_QUANT_AMAX``).

    Every quantized conv input in NCSN++ is a GroupNorm(+SiLU) output, so
    its range is ~N(0,1) silu-rectified times the learned affine — a fixed
    clip at 6.0 covers >5 sigma at random init.  Static scales delete the
    per-conv amax reduction pass (the dynamic path's main overhead), at the
    cost of clipping outliers; the A/B and the accuracy delta are measured,
    not assumed (results/perf_r5)."""
    return float(os.environ.get("NATDIFF_QUANT_AMAX", "6.0"))


def quantize_weight(w, axis=-1):
    """Static symmetric per-output-channel quantization.

    ``w``: [..., C_out] kernel.  Returns ``(w_i8, s_w)`` with
    ``s_w`` f32 broadcast against the reduction of all axes but ``axis``."""
    red = tuple(i for i in range(w.ndim) if i != (axis % w.ndim))
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=red, keepdims=True)
    s_w = jnp.maximum(amax, 1e-30) / _QMAX
    w_i8 = jnp.clip(jnp.round(w.astype(jnp.float32) / s_w),
                    -_QMAX, _QMAX).astype(jnp.int8)
    return w_i8, s_w


def quantize_act(x, per_sample: bool = True):
    """Dynamic symmetric activation quantization.

    Per-sample scales (``[B,1,1,1]``) by default: conv is linear per sample
    so dequant stays exact, and sample-to-sample range variance (large along
    an NI trajectory) doesn't crush per-tensor resolution."""
    xf = x.astype(jnp.float32)
    if per_sample:
        red = tuple(range(1, x.ndim))
        amax = jnp.max(jnp.abs(xf), axis=red, keepdims=True)
    else:
        amax = jnp.max(jnp.abs(xf))
    s_x = jnp.maximum(amax, 1e-30) / _QMAX
    x_i8 = jnp.clip(jnp.round(xf / s_x), -_QMAX, _QMAX).astype(jnp.int8)
    return x_i8, s_x


def quantize_act_static(x, amax: float):
    """Static symmetric activation quantization: a compile-time clip range
    instead of the dynamic amax reduction — one fewer pass over the
    activations, outliers saturate at ±amax."""
    s = amax / _QMAX
    x_i8 = jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / s)),
                    -_QMAX, _QMAX).astype(jnp.int8)
    return x_i8, s


def conv3x3_int8(x, w, bias=None, *, per_sample: bool = True,
                 w_i8=None, s_w=None, act_amax: float | None = None):
    """3x3/stride-1/SAME conv computed on the int8 MXU path.

    ``x``: [B,H,W,Cin] activations (any float dtype), ``w``: [3,3,Cin,Cout]
    float kernel (quantized in-graph unless a pre-quantized ``(w_i8, s_w)``
    pair is supplied).  ``act_amax``: static activation clip range (skips
    the dynamic amax pass).  Output: x.dtype, same spatial shape.
    """
    if w_i8 is None:
        w_i8, s_w = quantize_weight(w)          # s_w: [1,1,1,Cout]
    if act_amax is not None:
        x_i8, s_x = quantize_act_static(x, act_amax)
        scale = s_x * s_w.reshape(1, 1, 1, -1)
    else:
        x_i8, s_x = quantize_act(x, per_sample=per_sample)
        scale = (s_x.reshape(s_x.shape[0] if per_sample else 1, 1, 1, 1)
                 * s_w.reshape(1, 1, 1, -1))
    y = jax.lax.conv_general_dilated(
        x_i8, w_i8, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    out = y.astype(jnp.float32) * scale
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def conv1x1_int8(x, w, bias=None, *, per_sample: bool = True,
                 act_amax: float | None = None):
    """1x1 conv / NIN (channel matmul) on the int8 path; same scheme.

    ``w``: [..., Cin, Cout] (a [1,1,Cin,Cout] conv kernel or a [Cin,Cout]
    NIN matrix).  ``x``: [B, ..., Cin] with any number of middle axes.
    ``act_amax``: static clip range (``int8_all_static``) — drops the
    dynamic amax pass, same trade as :func:`conv3x3_int8`."""
    w2 = w.reshape(w.shape[-2], w.shape[-1])
    w_i8, s_w = quantize_weight(w2)             # s_w: [1, Cout]
    if act_amax is not None:
        x_i8, s_x = quantize_act_static(x, act_amax)
        scale = s_x * s_w.reshape((1,) * (x.ndim - 1) + (-1,))
    else:
        x_i8, s_x = quantize_act(x, per_sample=per_sample)
        bshape = (s_x.shape[0] if per_sample else 1,) + (1,) * (x.ndim - 1)
        scale = s_x.reshape(bshape) * s_w.reshape(
            (1,) * (x.ndim - 1) + (-1,))
    y = jax.lax.dot_general(
        x_i8.reshape(x.shape[0], -1, x.shape[-1]), w_i8,
        (((2,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    y = y.reshape(*x.shape[:-1], w2.shape[-1])
    out = y.astype(jnp.float32) * scale
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)
