"""Micro-bench: Pallas implicit-GEMM 3x3 conv vs XLA's conv schedule.

The CIFAR-10 NCSN++ headline forward is ~97% device-occupied with XLA conv
fusions at ~80% MXU efficiency (PERF.md) — this bench measures whether the
hand-written kernel (ops/conv3x3.py) beats that schedule at the model's hot
shapes (the resblock convs of ``CIFAR10_DDPMPP_CONTINUOUS`` at micro-batch
64, including the skip-concatenated up-path widths).  The DMA-halo
``tiled`` variant (the large-feature-map path) is benched at the same
shapes for an apples-to-apples read on its halo/DMA overhead.

Run on the TPU host:
    python -m naturaldiffusion_tpu.apps.bench_conv [--reps 30] [--runs 7]
Prints one JSON line per shape with ms/call per backend, TFLOP/s, and the
speedup.  Backends are interleaved per run (the chip drifts — PERF.md
"Methodology").
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

from ..ops.conv3x3 import conv3x3_pallas, conv3x3_xla

# (B, H, W, C_in, C_out) — every lane-aligned conv family in the CIFAR-10
# bench forward at micro-batch 64
SHAPES = [
    (64, 32, 32, 128, 128),   # res-32 resblock convs
    (64, 32, 32, 256, 128),   # res-32 up path (skip-concat input)
    (64, 16, 16, 256, 256),   # res-16 resblock convs
    (64, 16, 16, 512, 256),   # res-16 up path
    (64, 8, 8, 256, 256),     # res-8 resblock convs
    (4, 256, 256, 128, 128),  # celebahq-256 level-0 (tiled-only vs XLA)
]


def _chain(fn, w, b, reps):
    def body(i, xx):
        o = fn(xx, w, b)
        # scalar-checksum feedback: forces full compute each iteration
        # regardless of the output shape, perturbs the iterate negligibly
        return xx + (jnp.sum(o, dtype=jnp.float32) * 1e-9).astype(xx.dtype)
    return jax.jit(lambda x: jnp.float32(
        jax.lax.fori_loop(0, reps, body, x).sum()))


def bench_shape(shape, reps=30, runs=7, dtype=jnp.bfloat16):
    bsz, hh, ww, cin, cout = shape
    x = jax.random.normal(jax.random.PRNGKey(0), (bsz, hh, ww, cin), dtype)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout),
                          dtype) * 0.05
    bias = jnp.zeros((cout,), dtype)

    def pallas(variant):
        return lambda a, ww, bb: conv3x3_pallas(a, ww, bb, variant=variant)

    fns = {"xla": _chain(conv3x3_xla, w, bias, reps),
           "taps9": _chain(pallas("taps9"), w, bias, reps),
           "kstack": _chain(pallas("kstack"), w, bias, reps),
           "valid9": _chain(pallas("valid9"), w, bias, reps),
           "tiled": _chain(pallas("tiled"), w, bias, reps),
           "tiledew": _chain(pallas("tiledew"), w, bias, reps)}
    errors = {}
    for k in list(fns):
        try:
            _ = float(fns[k](x))             # compile + warm
        except Exception as e:               # a variant failing Mosaic
            errors[k] = f"{type(e).__name__}: {str(e)[:200]}"
            del fns[k]                       # must not kill the others
    times = {k: [] for k in fns}
    for _ in range(runs):                    # interleave: chip drift
        for k, f in fns.items():
            t0 = time.time()
            _ = float(f(x))
            times[k].append(time.time() - t0)
    med = {k: sorted(v)[len(v) // 2] / reps for k, v in times.items()}
    flops = 2 * bsz * hh * ww * 9 * cin * cout
    out = {"shape": list(shape)}
    for k, t in med.items():
        out[f"{k}_ms"] = round(t * 1e3, 3)
        out[f"{k}_tflops"] = round(flops / t / 1e12, 1)
    for k, msg in errors.items():
        out[f"{k}_error"] = msg
    cands = [k for k in ("taps9", "kstack", "valid9", "tiled", "tiledew")
             if k in med]
    if cands and "xla" in med:
        best = min(cands, key=lambda k: med[k])
        out["pallas_ms"] = out[f"{best}_ms"]
        out["best_variant"] = best
        out["speedup"] = round(med["xla"] / med[best], 3)
    return out


def bench_model(name, batch=2, reps=4, runs=5, dtype=jnp.bfloat16):
    """In-model A/B at a large-feature-map config (celebahq-256-class):
    one NCSN++ forward per mode — XLA convs vs the Pallas dispatch with
    each halo-tiled form (level-0 maps ride the tiled kernel, deeper
    levels the whole-image ``valid9``) vs the fused-resblock flag.  The
    conv flags are trace-time, so each mode re-jits."""
    import os

    from ..configs import get_config
    from ..models.ncsnpp import NCSNpp

    cfg = get_config(name)
    model = NCSNpp(config=cfg.model)
    sz, ch = cfg.data.image_size, cfg.data.num_channels
    x1 = jnp.zeros((1, sz, sz, ch), jnp.float32)
    params = jax.jit(lambda k: model.init(k, x1, jnp.zeros(1))["params"])(
        jax.random.PRNGKey(0))
    p16 = jax.tree.map(lambda a: a.astype(dtype), params)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, sz, sz, ch), dtype)

    def fwd(z):
        return model.apply({"params": p16}, z,
                           jnp.full((z.shape[0],), 500.0, jnp.float32))

    def chain(z):
        def body(i, zz):
            o = fwd(zz)
            return zz + (jnp.sum(o, dtype=jnp.float32) * 1e-9).astype(zz.dtype)
        return jnp.float32(jax.lax.fori_loop(0, reps, body, z).sum())

    out = {"model": name, "batch": batch, "reps": reps}
    modes = [("xla", "0", None), ("pallas_tiled", "1", "tiled"),
             ("pallas_tiledew", "1", "tiledew"),
             ("pallas_fused", "2", "tiledew")]
    saved = {k: os.environ.get(k) for k in
             ("NATDIFF_PALLAS_CONV", "NATDIFF_CONV_TILED")}
    try:
        fns = {}
        for label, flag, tform in modes:
            os.environ["NATDIFF_PALLAS_CONV"] = flag
            if tform is not None:
                os.environ["NATDIFF_CONV_TILED"] = tform
            f = jax.jit(chain)
            try:
                _ = float(f(x))              # trace under this flag + warm
            except Exception as e:
                out[f"{label}_error"] = f"{type(e).__name__}: {str(e)[:200]}"
                continue
            fns[label] = f
        times = {k: [] for k in fns}
        for _ in range(runs):                # interleave: chip drift
            for label, f in fns.items():
                t0 = time.time()
                _ = float(f(x))
                times[label].append(time.time() - t0)
        for label, ts in times.items():
            med = sorted(ts)[len(ts) // 2] / reps
            out[f"{label}_ms"] = round(med * 1e3, 2)
            out[f"{label}_img_s"] = round(batch / med, 2)
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--runs", type=int, default=7)
    ap.add_argument("--shapes", type=int, default=None,
                    help="bench only the first N shapes")
    ap.add_argument("--toy", action="store_true",
                    help="tiny shape, 2 reps — CPU smoke test of the app")
    ap.add_argument("--model", default=None, metavar="CONFIG",
                    help="instead of op shapes, A/B a full model forward "
                         "at this configs_zoo preset (e.g. "
                         "ve/celebahq_256_ncsnpp_continuous)")
    ap.add_argument("--batch", type=int, default=2,
                    help="--model mode batch size")
    args = ap.parse_args(argv)
    if args.model:
        print(json.dumps(bench_model(args.model, batch=args.batch,
                                     runs=args.runs)), flush=True)
        return 0
    shapes = [(2, 8, 8, 128, 128)] if args.toy else SHAPES[: args.shapes]
    reps, runs = (2, 1) if args.toy else (args.reps, args.runs)
    for shape in shapes:
        print(json.dumps(bench_shape(shape, reps=reps, runs=runs)),
              flush=True)
    return 0


if __name__ == "__main__":
    main()
