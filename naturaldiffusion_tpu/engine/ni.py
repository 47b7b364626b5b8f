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
) -> jnp.ndarray:
    """Run Natural Inference; returns the final state ``z`` (decoded sample).

    ``denoise_fn(x, t) -> pred``: the (already CFG-wrapped, batched) network;
    ``pred`` is converted to x0 according to ``prediction_type``.
    ``init_noise``: ``[B, ...]`` prior sample (eps column 0).
    ``noises``: optional ``[n, B, ...]`` injected noises (columns 1..n); drawn
    from ``key`` when omitted; ignored for deterministic schedules.

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

    if unroll is None:
        unroll = n <= 32
    if unroll:
        z = z0
        seq_x0: list = []
        x0_m = sched.x0.astype(acc)
        eps_m = sched.eps.astype(acc)
        for k in range(n):
            pred = denoise_fn(z.astype(model_dtype), sched.node[k, 0])
            x0 = to_x0(pred, z, sched.node[k, 1], sched.node[k, 2],
                       prediction_type, accum_dtype=acc)
            seq_x0.append(x0)
            next_x0 = sum(x0_m[k, j] * seq_x0[j] for j in range(k + 1))
            next_eps = sum(eps_m[k, j] * buf_eps[j]
                           for j in range(min(eps_cols, k + 2)))
            z = next_x0 + next_eps
        return z

    buf_x0 = jnp.zeros((n,) + shape, dtype=acc)

    def step(carry, inp):
        z, buf_x0 = carry
        k, w_x0, w_eps, t = inp
        # the model sees the *current* node's time and marginals, node[k]
        pred = denoise_fn(z.astype(model_dtype), t)
        x0 = to_x0(pred, z, sched.node[k, 1], sched.node[k, 2],
                   prediction_type, accum_dtype=acc)
        buf_x0 = jax.lax.dynamic_update_index_in_dim(buf_x0, x0, k, axis=0)
        next_x0 = weighted_sum_fn(w_x0, buf_x0, accum_dtype=acc)
        next_eps = weighted_sum_fn(w_eps[:eps_cols], buf_eps, accum_dtype=acc)
        return (next_x0 + next_eps, buf_x0), None

    xs = (jnp.arange(n), sched.x0.astype(acc), sched.eps.astype(acc),
          sched.node[:n, 0])
    (z, _), _ = jax.lax.scan(step, (z0, buf_x0), xs)
    return z


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
