"""Accuracy budget for the W8A8 int8 inference path (VERDICT r5 task 1).

Bounds the quantization noise of ``NATDIFF_QUANT=int8`` with the tools the
judge asked for: the 10-step NI trajectory of the CIFAR-10 NCSN++ backbone
is run three ways — fp64 host-loop oracle (``natural_inference_reference``),
the production bf16 engine, and the bf16 engine with the int8 conv path —
and the pairwise final-image errors are reported.  The bf16-vs-oracle gap is
the existing production noise floor; int8 is acceptable when its extra error
is the same order (it adds ~1/254 per-operand rounding noise on top of
bf16's ~1/256 mantissa quantum, so parity is the expected outcome, not a
lucky one).

    python -m naturaldiffusion_tpu.apps.quant_accuracy \
        [--workdir <train workdir>] [--out results/perf_r5/quant_accuracy.json]

With ``--workdir`` the trajectory uses trained EMA weights (the generative
roundtrip model) instead of random init, and the report gains the
sample-quality deltas: W1 of per-image means/grads between the bf16 and int8
sample populations (the roundtrip.py metrics).

CAVEAT (measured r5): random-init runs UNDERSTATE quantization noise by
orders of magnitude — every resblock's Conv_1 is zero-init
(``init_scale=0.0``, the reference's convention), so at random init the
residual branches contribute ~nothing and quant noise in Conv_0/NIN is
annihilated before it reaches the output (int8-vs-bf16 MAE ~1e-6 at random
init vs ~1e-2 trained).  Only ``--workdir`` (trained-EMA) runs bound the
production accuracy budget; random-init runs document finiteness only.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..coeffs import registry
from ..engine import (NISchedule, natural_inference,
                      natural_inference_reference)
from ..models.ncsnpp import NCSNpp, NCSNppConfig


def _mae(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.abs(a - b).mean()), float(np.abs(a - b).max())


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", default=None,
                   help="apps/train.py workdir (EMA weights); random init "
                        "otherwise")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--nf", type=int, default=128)
    p.add_argument("--ch-mult", type=lambda s: tuple(
        int(x) for x in s.split(",")), default=(1, 2, 2, 2))
    p.add_argument("--num-res-blocks", type=int, default=4)
    p.add_argument("--out", default=None)
    p.add_argument("--mode", default="int8",
                   choices=("int8", "int8_static", "int8_all",
                            "int8_all_static"))
    args = p.parse_args(argv)

    model = NCSNpp(config=NCSNppConfig(
        nf=args.nf, ch_mult=args.ch_mult,
        num_res_blocks=args.num_res_blocks))
    params = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, 32, 32, 3), jnp.float32),
        jnp.zeros(1))["params"])(jax.random.PRNGKey(1))
    weights_src = "random"
    if args.workdir:
        from ..train import checkpoint as ckpt
        from ..train import make_train_step
        from ..sde import VPSDE
        init_fn, _ = make_train_step(VPSDE(), lambda p_, x, t: None)
        state = ckpt.restore(args.workdir, jax.jit(init_fn)(params))
        if int(jax.device_get(state.step)) > 0:
            params = state.ema.shadow
            weights_src = f"ema_step{int(jax.device_get(state.step))}"
    p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    pf32 = jax.tree.map(lambda a: a.astype(jnp.float32), params)

    m = registry.derive("ddpm", args.steps)
    sched = NISchedule.from_matrix(m)
    key = jax.random.PRNGKey(7)
    z0 = jax.random.normal(jax.random.PRNGKey(0),
                           (args.batch, 32, 32, 3), jnp.float32)
    # shared per-step noises so all three loops walk the same trajectory
    noises = np.asarray(jax.random.normal(
        jax.random.PRNGKey(9), (args.steps, args.batch, 32, 32, 3)))

    def eps_bf16(z, t, *a):
        return model.apply({"params": p16}, z.astype(jnp.bfloat16),
                           jnp.full((z.shape[0],), t, jnp.float32))

    def _runner():
        # fresh function object per mode: the quant flag is read at TRACE
        # time, and jit's global trace cache is keyed on function identity —
        # re-jitting the same object after an env flip would silently reuse
        # the old trace (see ops/quant.py docstring)
        def run_engine():
            # unroll=False: one model copy in the XLA program (the unrolled
            # 10-step graph compiles for ~40 min through the tunnel)
            return natural_inference(
                eps_bf16, sched, z0, prediction_type="eps",
                model_dtype=jnp.bfloat16, noises=jnp.asarray(noises),
                unroll=False)
        return run_engine

    out_bf16 = np.asarray(jax.jit(_runner())())
    os.environ["NATDIFF_QUANT"] = args.mode
    out_int8 = np.asarray(jax.jit(_runner())())
    os.environ.pop("NATDIFF_QUANT")

    # fp64 host oracle around the f32 on-device model (the engine's own
    # parity convention: engine/ni.py natural_inference_reference)
    f32_fwd = jax.jit(lambda z, t: model.apply(
        {"params": pf32}, z, jnp.full((z.shape[0],), t, jnp.float32)))
    oracle = natural_inference_reference(
        lambda z, t: np.asarray(f32_fwd(jnp.asarray(z, jnp.float32), t)),
        m, np.asarray(z0), noises=noises, prediction_type="eps")

    i8_bf, i8_bf_max = _mae(out_int8, out_bf16)
    bf_or, bf_or_max = _mae(out_bf16, oracle)
    i8_or, i8_or_max = _mae(out_int8, oracle)
    scale = float(np.abs(oracle).mean())
    report = {
        "weights": weights_src, "mode": args.mode,
        "steps": args.steps, "batch": args.batch,
        "output_mean_abs": round(scale, 5),
        "mae_int8_vs_bf16": i8_bf, "max_int8_vs_bf16": i8_bf_max,
        "mae_bf16_vs_fp64oracle": bf_or, "max_bf16_vs_fp64oracle": bf_or_max,
        "mae_int8_vs_fp64oracle": i8_or, "max_int8_vs_fp64oracle": i8_or_max,
        "int8_extra_error_ratio": round(i8_or / max(bf_or, 1e-30), 3),
        "finite": bool(np.isfinite(out_int8).all()),
    }
    if args.workdir and weights_src != "random":
        # population-level sample-quality delta (roundtrip W1 marginals)
        from ..apps.toy_dataset import summary_stats, wasserstein1
        sb = summary_stats(np.clip((out_bf16 + 1) / 2, 0, 1))
        si = summary_stats(np.clip((out_int8 + 1) / 2, 0, 1))
        report["w1_delta"] = {
            k: round(wasserstein1(sb[k], si[k]), 6) for k in sb}
    print(json.dumps(report))
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as fh:
            json.dump(report, fh, indent=1)
    return 0 if report["finite"] else 1


if __name__ == "__main__":
    import sys
    sys.exit(main())
