"""upfirdn2d — upsample, FIR-filter, downsample in one fused op (NHWC).

TPU-native equivalent of the reference CUDA extension
(``deps/score_sde_pytorch/op/upfirdn2d_kernel.cu:49-368``; exact semantics
spelled out by the CPU fallback ``op/upfirdn2d.py:159-200``):

    zero-stuff by ``up`` -> zero-pad -> convolve with the 2D FIR kernel
    (true convolution, i.e. the kernel is flipped) -> stride by ``down``.

On TPU this maps onto ONE ``lax.conv_general_dilated``:
``lhs_dilation`` implements the zero-stuffing, ``padding`` the (possibly
negative) pads, ``window_strides`` the down-sampling, and
``feature_group_count=C`` makes the FIR depthwise.  XLA lowers dilated
depthwise convs onto the MXU/VPU with fusion, so — unlike the CUDA
situation the reference kernel was written for — a hand-scheduled kernel
has nothing left to win here; the Pallas budget goes to the weighted-sum
ring buffer instead (``ops/weighted_sum.py``).

Layout note: the whole framework is NHWC (TPU-native); the reference is NCHW.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def upfirdn2d(x, kernel, up: int = 1, down: int = 1,
              pad: tuple[int, int] = (0, 0)):
    """``x``: [N, H, W, C]; ``kernel``: [kh, kw] FIR filter.

    Returns [N, H', W', C] with
    ``H' = (H*up + pad0 + pad1 - kh) // down + 1``.
    """
    n, h, w, c = x.shape
    kh, kw = kernel.shape
    # lax conv is cross-correlation; flip for true convolution (matches the
    # reference's torch.flip before F.conv2d)
    k = jnp.asarray(kernel, x.dtype)[::-1, ::-1]
    k = jnp.tile(k.reshape(kh, kw, 1, 1), (1, 1, 1, c))     # HWIO, depthwise

    # lhs_dilation inserts zeros BETWEEN samples only ((h-1)*up+1); the
    # reference zero-stuffing appends up-1 trailing zeros too (h*up) — fold
    # those into the trailing pad (they contribute nothing to the FIR).
    return jax.lax.conv_general_dilated(
        x, k,
        window_strides=(down, down),
        padding=((pad[0], pad[1] + up - 1), (pad[0], pad[1] + up - 1)),
        lhs_dilation=(up, up),
        rhs_dilation=(1, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def _setup_kernel(k) -> np.ndarray:
    """Normalize a 1-D (outer-product) or 2-D FIR kernel, float64.

    Reference: ``deps/score_sde_pytorch/models/up_or_down_sampling.py:53-63``.
    """
    k = np.asarray(k, dtype=np.float64)
    if k.ndim == 1:
        k = np.outer(k, k)
    k /= np.sum(k)
    assert k.ndim == 2 and k.shape[0] == k.shape[1]
    return k


def upsample_2d(x, k=None, factor: int = 2, gain: float = 1.0):
    """FIR upsample by ``factor`` (reference ``up_or_down_sampling.py:190-223``)."""
    if k is None:
        k = [1] * factor
    k = _setup_kernel(k) * (gain * factor ** 2)
    p = k.shape[0] - factor
    return upfirdn2d(x, jnp.asarray(k), up=factor,
                     pad=((p + 1) // 2 + factor - 1, p // 2))


def downsample_2d(x, k=None, factor: int = 2, gain: float = 1.0):
    """FIR downsample by ``factor`` (reference ``up_or_down_sampling.py:226-255``)."""
    if k is None:
        k = [1] * factor
    k = _setup_kernel(k) * gain
    p = k.shape[0] - factor
    return upfirdn2d(x, jnp.asarray(k), down=factor,
                     pad=((p + 1) // 2, p // 2))


def upsample_conv_2d(x, w, k=None, factor: int = 2, gain: float = 1.0):
    """Fused upsample + conv2d (reference ``up_or_down_sampling.py:72-141``).

    ``w``: [kh, kw, C_in, C_out] (HWIO).  The reference's pre-flipped
    ``conv_transpose2d(stride=factor)`` nets out to: zero-stuff by ``factor``,
    full-pad by ``kh-1``, correlate with the ORIGINAL kernel — which is one
    ``conv_general_dilated`` with ``lhs_dilation``; the FIR pass follows.
    Output: [N, H*factor, W*factor, C_out].
    """
    ch, cw, cin, cout = w.shape
    assert ch == cw
    if k is None:
        k = [1] * factor
    k = _setup_kernel(k) * (gain * factor ** 2)
    p = (k.shape[0] - factor) - (cw - 1)

    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1),
        padding=((ch - 1, ch - 1), (cw - 1, cw - 1)),
        lhs_dilation=(factor, factor),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return upfirdn2d(y, jnp.asarray(k),
                     pad=((p + 1) // 2 + factor - 1, p // 2 + 1))


def conv_downsample_2d(x, w, k=None, factor: int = 2, gain: float = 1.0):
    """Fused conv2d + downsample (reference ``up_or_down_sampling.py:144-187``)."""
    ch, cw, cin, cout = w.shape
    assert ch == cw
    if k is None:
        k = [1] * factor
    k = _setup_kernel(k) * gain
    p = (k.shape[0] - factor) + (cw - 1)
    y = upfirdn2d(x, jnp.asarray(k), pad=((p + 1) // 2, p // 2))
    return jax.lax.conv_general_dilated(
        y, w, window_strides=(factor, factor), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
