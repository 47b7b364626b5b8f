"""Train state + jitted step factory (the ``get_step_fn`` equivalent,
reference ``deps/score_sde_pytorch/losses.py:151-210`` +
``run_lib.py:104-145``).

The step is a pure function over a ``TrainState`` pytree, so it jits/pjits
unchanged on 1 chip or a mesh — sharding comes entirely from the in/out
shardings the caller attaches (see :mod:`naturaldiffusion_tpu.parallel`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import optax

from .ema import EMA
from .losses import make_optimizer, sde_loss_fn


@dataclasses.dataclass(frozen=True)
class TrainState:
    step: Any
    params: Any
    opt_state: Any
    ema: EMA

    @classmethod
    def create(cls, params, tx, ema_decay: float = 0.9999):
        return cls(step=0, params=params, opt_state=tx.init(params),
                   ema=EMA.create(params, decay=ema_decay))


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.step, s.params, s.opt_state, s.ema), None),
    lambda _, ch: TrainState(*ch),
)


def make_train_step(sde, apply_fn: Callable, *, lr: float = 2e-4,
                    warmup: int = 5000, grad_clip: float = 1.0,
                    reduce_mean: bool = True,
                    likelihood_weighting: bool = False,
                    continuous: bool = True,
                    remat: bool = False,
                    compute_dtype=None,
                    micro: int = 0):
    """Returns (init_fn(params) -> TrainState, step_fn(state, key, batch) ->
    (state, loss)).  ``apply_fn(params, x, t_label) -> model output``.

    ``remat=True`` wraps the model in ``jax.checkpoint`` — recompute
    activations in the backward pass instead of storing them (the standard
    HBM/FLOPs trade for transformer-scale models; the 62M NCSN++ doesn't
    need it, a 2B MMDiT does).  Jit the returned ``step_fn`` with
    ``donate_argnums=(0,)`` so the old TrainState's buffers are reused.

    ``compute_dtype=jnp.bfloat16`` is the TPU mixed-precision mode the
    reference (f32-only torch, ``run_lib.py:127-173``) has no equivalent
    of: master params, Adam moments, EMA, loss, and grads all stay f32;
    only the network fwd/bwd runs in bf16 (the MXU's native dtype — 4x
    the f32 matmul peak on v5e).  The default ``None`` keeps bit-for-bit
    reference-parity f32.

    ``micro=M`` (0 = off) is gradient accumulation: the batch is processed
    in M-sample chunks under ``lax.scan``, f32 grads/loss accumulated in
    the carry — the training twin of the inference micro-batch lesson
    (PERF.md: small chunks keep the activation working set VMEM-resident
    where a monolithic batch spills to HBM).  Equal-size chunks make the
    mean-of-means exact; the per-chunk RNG folds ``key`` per chunk, so
    the drawn (t, noise) differ from the monolithic step — statistically
    identical, bitwise not."""
    tx = make_optimizer(lr=lr, warmup=warmup, grad_clip=grad_clip)
    if compute_dtype is not None:
        base_apply = apply_fn

        def apply_fn(p_, x, t_label):
            p_lo = jax.tree.map(lambda a: a.astype(compute_dtype), p_)
            out = base_apply(p_lo, x.astype(compute_dtype), t_label)
            return out.astype(jax.numpy.float32)
    if remat:
        apply_fn = jax.checkpoint(apply_fn)

    def init_fn(params) -> TrainState:
        return TrainState.create(params, tx)

    def loss_fn(params, key, batch):
        return sde_loss_fn(sde, apply_fn, params, key, batch,
                           reduce_mean=reduce_mean,
                           likelihood_weighting=likelihood_weighting,
                           continuous=continuous)

    def step_fn(state: TrainState, key, batch):
        if micro and batch.shape[0] > micro:
            if batch.shape[0] % micro:
                raise ValueError(
                    f"micro={micro} must divide batch {batch.shape[0]}")
            n = batch.shape[0] // micro
            chunks = batch.reshape(n, micro, *batch.shape[1:])
            keys = jax.random.split(key, n)

            def body(carry, xk):
                x, k = xk
                l, g = jax.value_and_grad(loss_fn)(state.params, k, x)
                # f32 loss carry regardless of input dtype (x64 test islands)
                return (carry[0] + l.astype(jax.numpy.float32),
                        jax.tree.map(jax.numpy.add, carry[1], g)), None

            g0 = jax.tree.map(jax.numpy.zeros_like, state.params)
            (lsum, gsum), _ = jax.lax.scan(
                body, (jax.numpy.zeros((), jax.numpy.float32), g0),
                (chunks, keys))
            loss = lsum / n
            grads = jax.tree.map(lambda a: a / n, gsum)
        else:
            loss, grads = jax.value_and_grad(loss_fn)(state.params, key,
                                                      batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state,
                          ema=state.ema.update(params)), loss

    return init_fn, step_fn
