"""Profiling/timing harness (SURVEY.md §5 tracing row — the reference has
only step-progress prints).

* :class:`Timer` — median-of-k wall timing that forces a device->host scalar
  per iteration (``block_until_ready`` alone does not reliably synchronize
  through the TPU tunnel; see .claude/skills/verify/SKILL.md).
* :func:`trace` — context manager around ``jax.profiler`` for xprof dumps.
* :class:`NFECounter` — wrap a denoiser to count network function
  evaluations (the per-step NFE accounting the FID sweeps report).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp


class Timer:
    """``Timer()(fn, *args)`` -> median seconds over ``iters`` calls."""

    def __init__(self, iters: int = 5):
        self.iters = iters
        self.times: list[float] = []

    def __call__(self, fn: Callable, *args, **kwargs) -> float:
        reduced = jax.jit(lambda *a: jnp.float32(
            sum(jnp.sum(x) for x in jax.tree.leaves(fn(*a)))))
        float(reduced(*args))          # compile + warm
        self.times = []
        for _ in range(self.iters):
            t0 = time.time()
            float(reduced(*args))      # host transfer forces completion
            self.times.append(time.time() - t0)
        return sorted(self.times)[len(self.times) // 2]


@contextlib.contextmanager
def trace(logdir: str):
    """xprof trace around a block (view with tensorboard/xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class NFECounter:
    """Counts denoiser *call sites at trace time*.  For unrolled loops (the
    NI default at n<=32) this is the true per-sample NFE; scan-based loops
    trace the body once, so multiply by the scan length instead."""

    def __init__(self, fn: Callable):
        self.fn = fn
        self.nfe = 0

    def __call__(self, *args, **kwargs):
        self.nfe += 1
        return self.fn(*args, **kwargs)

    def reset(self):
        self.nfe = 0
