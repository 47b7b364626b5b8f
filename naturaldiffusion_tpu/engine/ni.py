"""Natural-Inference execution engine — one jitted ``lax.scan``.

This is the TPU-native form of the reference's NI loops
(``src/ValidateNaturalInference.py:311-372``,
``src/CIFAR10NaturalInference.py:241-317``, ``src/SD3NaturalInference.py:
172-245``): a single compiled executable whose carry is ``(z, buffer of past
predicted x0's)`` and whose per-step inputs are rows of the coefficient
matrices.  Every sampler is *data* (a :class:`CoeffMatrix`), not code.

Key differences from the reference (by design, for XLA):

* the Python list-of-tensors + fp64 scalar loop becomes a pre-allocated
  ``[n, ...]`` buffer + one ``w @ buf`` contraction per step (MXU/VPU);
* all injected noises are drawn up front as a ``[n+1, ...]`` tensor (column 0
  of the eps matrix is the initial noise), so the scan body is RNG-free and
  the whole trajectory is reproducible from one key;
* accumulation dtype is explicit (``accum_dtype``, default float32 — the
  reference uses fp64 host scalars; float64 islands are available on CPU for
  parity tests).

The weighted sums ride either plain XLA dot_generals or the fused Pallas
ring-buffer kernel (:mod:`naturaldiffusion_tpu.ops.weighted_sum`).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..coeffs.matrix import CoeffMatrix
from .predictions import to_x0
from ..ops.weighted_sum import weighted_sum_xla


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class NISchedule:
    """Device-side CoeffMatrix: the three arrays as jnp, plus static flags."""

    x0: jnp.ndarray        # [n, n] lower-triangular
    eps: jnp.ndarray       # [n, n+1]
    node: jnp.ndarray      # [n+1, 3] (t, alpha, sigma)
    deterministic: bool = False   # static: True if eps[:, 1:] == 0

    @classmethod
    def from_matrix(cls, m: CoeffMatrix, dtype=jnp.float32) -> "NISchedule":
        return cls(
            x0=jnp.asarray(m.x0, dtype),
            eps=jnp.asarray(m.eps, dtype),
            node=jnp.asarray(m.node, dtype),
            deterministic=m.is_deterministic,
        )

    @property
    def num_step(self) -> int:
        return self.x0.shape[0]

    def tree_flatten(self):
        return (self.x0, self.eps, self.node), self.deterministic

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, deterministic=aux)


# ---------------------------------------------------------------------------
# The scan loop
# ---------------------------------------------------------------------------


def natural_inference(
    denoise_fn: Callable,
    sched: NISchedule,
    init_noise: jnp.ndarray,
    *,
    noises: jnp.ndarray | None = None,
    key: jax.Array | None = None,
    prediction_type: str = "x0",
    accum_dtype=jnp.float32,
    model_dtype=None,
    weighted_sum_fn=weighted_sum_xla,
    unroll: bool | None = None,
    use_pallas: bool | None = None,
    step_inputs=None,
) -> jnp.ndarray:
    """Run Natural Inference; returns the final state ``z`` (decoded sample).

    ``denoise_fn(x, t) -> pred``: the (already CFG-wrapped, batched) network;
    ``pred`` is converted to x0 according to ``prediction_type``.
    ``init_noise``: ``[B, ...]`` prior sample (eps column 0).
    ``noises``: optional ``[n, B, ...]`` injected noises (columns 1..n); drawn
    from ``key`` when omitted; ignored for deterministic schedules.
    ``step_inputs``: optional pytree whose leaves carry a leading ``[n]``
    axis — per-step auxiliary model inputs.  When given, the model is called
    as ``denoise_fn(x, t, aux_k)`` with the k-th slice.  This is how
    schedule-constant conditioning (e.g. all 28 steps' adaLN modulation
    vectors, precomputed in ONE full-MXU matmul) rides the scan instead of
    being recomputed per step at MXU-starved batch sizes.

    ``unroll``: unroll the step loop instead of ``lax.scan``.  Default: on
    for n <= 32.  The unrolled form lets XLA keep the x0 history as live
    values instead of a carried ring buffer — measured ~1.5x faster on v5e
    at NI's typical step counts; scan keeps compile time bounded for large n.

    Reference loop shape: ``src/ValidateNaturalInference.py:345-366``.
    """
    n = sched.num_step
    shape = init_noise.shape
    acc = accum_dtype
    model_dtype = model_dtype or init_noise.dtype

    if step_inputs is None:
        aux_tree = ()                               # leafless: scan-safe
        call = lambda z, t, aux: denoise_fn(z, t)   # noqa: E731
    else:
        aux_tree = step_inputs
        call = denoise_fn

    if not sched.deterministic:
        if noises is None:
            if key is None:
                raise ValueError("stochastic schedule needs `noises` or `key`")
            noises = jax.random.normal(key, (n,) + shape, dtype=acc)
        buf_eps = jnp.concatenate(
            [init_noise.astype(acc)[None], noises.astype(acc)], axis=0)
    else:
        buf_eps = init_noise.astype(acc)[None]          # [1, ...] column 0 only

    z0 = init_noise.astype(acc)            # x at node 0 IS the prior sample
    eps_cols = buf_eps.shape[0]

    if use_pallas:
        unroll = False          # the kernel is the scan path's inner op
    if unroll is None:
        unroll = n <= 32
    if use_pallas is None:
        # the fused ring-buffer kernel reads only the live lower-triangular
        # prefix: 3-4x over the XLA scan at n>=100 on v5e.  f32-only: the
        # kernel accumulates in f32, so an fp64 parity run (jax_enable_x64
        # apps) must stay on the XLA scan to keep its precision
        use_pallas = ((not unroll)
                      and jax.devices()[0].platform == "tpu"
                      and jnp.dtype(acc) == jnp.float32)
    if unroll:
        z = z0
        seq_x0: list = []
        x0_m = sched.x0.astype(acc)
        eps_m = sched.eps.astype(acc)
        for k in range(n):
            aux_k = jax.tree.map(lambda a: a[k], aux_tree)
            pred = call(z.astype(model_dtype), sched.node[k, 0], aux_k)
            x0 = to_x0(pred, z, sched.node[k, 1], sched.node[k, 2],
                       prediction_type, accum_dtype=acc)
            seq_x0.append(x0)
            next_x0 = sum(x0_m[k, j] * seq_x0[j] for j in range(k + 1))
            next_eps = sum(eps_m[k, j] * buf_eps[j]
                           for j in range(min(eps_cols, k + 2)))
            z = next_x0 + next_eps
        return z

    if use_pallas:
        return _scan_pallas(call, aux_tree, sched, z0, buf_eps, eps_cols,
                            prediction_type, acc, model_dtype)

    buf_x0 = jnp.zeros((n,) + shape, dtype=acc)

    def step(carry, inp):
        z, buf_x0 = carry
        k, w_x0, w_eps, t, aux = inp
        # the model sees the *current* node's time and marginals, node[k]
        pred = call(z.astype(model_dtype), t, aux)
        x0 = to_x0(pred, z, sched.node[k, 1], sched.node[k, 2],
                   prediction_type, accum_dtype=acc)
        buf_x0 = jax.lax.dynamic_update_index_in_dim(buf_x0, x0, k, axis=0)
        next_x0 = weighted_sum_fn(w_x0, buf_x0, accum_dtype=acc)
        next_eps = weighted_sum_fn(w_eps[:eps_cols], buf_eps, accum_dtype=acc)
        return (next_x0 + next_eps, buf_x0), None

    xs = (jnp.arange(n), sched.x0.astype(acc), sched.eps.astype(acc),
          sched.node[:n, 0], aux_tree)
    (z, _), _ = jax.lax.scan(step, (z0, buf_x0), xs)
    return z


def _scan_pallas(call, aux_tree, sched, z0, buf_eps, eps_cols,
                 prediction_type, acc, model_dtype):
    """Scan variant whose per-step dual weighted sum is the fused Pallas
    ring-buffer kernel (SURVEY.md §7 / BASELINE.json north star): one VMEM
    pass over both buffers, whole zero-weight row chunks skipped, so only the
    live lower-triangular prefix is read."""
    from ..ops.weighted_sum import (fused_weighted_sum_pallas, pad_rows,
                                    pad_lanes)

    n = sched.num_step
    shape = z0.shape
    m = int(np.prod(shape))
    m_pad = pad_lanes(m)
    npad = pad_rows(n)
    epad = pad_rows(eps_cols)

    def flat_pad(a, rows):
        a = a.reshape(a.shape[0], -1).astype(jnp.float32)
        return jnp.pad(a, ((0, rows - a.shape[0]), (0, m_pad - m)))

    tile = next(t for t in (512, 256, 128) if m_pad % t == 0)
    interpret = jax.devices()[0].platform != "tpu"   # CPU tests

    bufe = flat_pad(buf_eps, epad)
    bufx = jnp.zeros((npad, m_pad), jnp.float32)
    w_x0 = jnp.pad(sched.x0.astype(jnp.float32), ((0, 0), (0, npad - n)))
    # only the live eps columns: deterministic schedules carry one column
    # (the initial noise) while sched.eps is stored [n, n+1]
    w_eps = jnp.pad(sched.eps.astype(jnp.float32)[:, :eps_cols],
                    ((0, 0), (0, epad - eps_cols)))

    def step(carry, inp):
        z, bufx = carry
        k, wx, we, t, aux = inp
        z_img = z[:m].reshape(shape)            # drop the lane padding
        pred = call(z_img.astype(model_dtype), t, aux)
        x0 = to_x0(pred, z_img, sched.node[k, 1],
                   sched.node[k, 2], prediction_type, accum_dtype=acc)
        x0 = jnp.pad(x0.reshape(-1).astype(jnp.float32), (0, m_pad - m))
        bufx = jax.lax.dynamic_update_index_in_dim(bufx, x0, k, axis=0)
        # int32 live counts: under jax_enable_x64 (the fp64 parity apps)
        # arange produces int64 and Mosaic's scalar convert recurses
        z_next = fused_weighted_sum_pallas(
            wx, we, bufx, bufe, (k + 1).astype(jnp.int32),
            jnp.minimum(eps_cols, k + 2).astype(jnp.int32),
            tile=tile, interpret=interpret)
        return (z_next, bufx), None

    z0f = jnp.pad(z0.reshape(-1).astype(jnp.float32), (0, m_pad - m))
    xs = (jnp.arange(n), w_x0, w_eps, sched.node[:n, 0], aux_tree)
    (z, _), _ = jax.lax.scan(step, (z0f, bufx), xs)
    return z[:m].reshape(shape).astype(acc)


def natural_inference_checked(denoise_fn, sched: NISchedule, init_noise,
                              **kwargs):
    """NaN-guarded NI (SURVEY §5 sanitizer row): the scan under
    ``jax.experimental.checkify`` float checks.  Returns the final state and
    *throws* ``JaxRuntimeError`` if any step produced NaN/inf — a poisoned
    schedule or diverging model fails loudly instead of emitting NaN images.

    ~2x slower than :func:`natural_inference` (error plumbing through the
    scan carry); use for validation/debug runs, not the bench path."""
    from jax.experimental import checkify

    def run(z):
        out = natural_inference(denoise_fn, sched, z, **kwargs)
        checkify.check(jnp.isfinite(out).all(),
                       "natural_inference produced non-finite output")
        return out

    checked = checkify.checkify(run, errors=checkify.float_checks)
    err, out = jax.jit(checked)(init_noise)
    err.throw()
    return out


def natural_inference_reference(
    denoise_fn, matrix: CoeffMatrix, init_noise: np.ndarray,
    *, noises: np.ndarray | None = None, prediction_type: str = "x0",
) -> np.ndarray:
    """Plain NumPy float64 NI loop, structurally identical to the reference
    (``src/ValidateNaturalInference.py:345-366``).  Oracle for the scan."""
    n = matrix.num_step
    seq_eps = [np.asarray(init_noise, np.float64)]
    seq_x0: list[np.ndarray] = []
    z = seq_eps[0]
    for k in range(n):
        t, alpha, sigma = matrix.node[k]
        pred = np.asarray(denoise_fn(z, t), np.float64)
        if prediction_type == "eps":
            x0 = (z - sigma * pred) / alpha
        elif prediction_type == "x0":
            x0 = pred
        elif prediction_type == "v_flow":
            x0 = z - sigma * pred
        else:
            raise ValueError(prediction_type)
        seq_x0.append(x0)
        if not matrix.is_deterministic:
            if noises is not None:
                seq_eps.append(np.asarray(noises[k], np.float64))
            else:
                seq_eps.append(np.random.default_rng(1000 + k)
                               .standard_normal(z.shape))
        next_x0 = sum(matrix.x0[k, j] * seq_x0[j] for j in range(k + 1))
        next_eps = sum(matrix.eps[k, j] * seq_eps[j]
                       for j in range(min(len(seq_eps), k + 2)))
        z = next_x0 + next_eps
    return z
