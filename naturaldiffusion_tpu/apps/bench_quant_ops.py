"""Micro-bench: W8A8 int8 conv (ops/quant.py) vs the bf16 XLA conv.

The r4 roofline (PERF.md) pinned the CIFAR-10 headline at 94.5% of the v5e
*bf16* peak — the int8 MXU path (~2x peak) is the one lever that moves the
ceiling.  This bench measures, per hot shape of the CIFAR-10 NCSN++ forward:

  * ``bf16``      — XLA conv, the current production path (control)
  * ``int8_dyn``  — full W8A8 op: dynamic per-sample act quant + in-graph
                    per-channel weight quant + s8 conv + f32 dequant
                    (the realistic inference op, quant/dequant included)
  * ``int8_pt``   — per-tensor act scale variant (cheaper reduction)
  * ``int8_raw``  — s8 conv on pre-quantized operands, i32 checksum only
                    (the pure MXU int8 rate, upper bound)

plus one square GEMM cell (bf16 vs int8 dot_general) to pin the chip's
achievable int8:bf16 MXU ratio independent of conv scheduling.

Run on the TPU host:
    python -m naturaldiffusion_tpu.apps.bench_quant_ops [--reps 50] [--runs 7]
Prints one JSON line per shape (ms/call, TFLOP/s, speedup vs bf16).
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

from ..ops.conv3x3 import conv3x3_xla
from ..ops.quant import (conv1x1_int8, conv3x3_int8, quantize_act,
                         quantize_weight)

SHAPES = [
    (64, 32, 32, 128, 128),   # res-32 resblock convs
    (64, 32, 32, 256, 128),   # res-32 up path (skip-concat input)
    (64, 16, 16, 256, 256),   # res-16 resblock convs
    (64, 16, 16, 512, 256),   # res-16 up path
    (64, 8, 8, 256, 256),     # res-8 resblock convs
    (64, 4, 4, 256, 256),     # res-4 resblock convs
]


def _chain_f(fn, reps):
    """Checksum-feedback loop on a float carry (forces execution each rep)."""
    def body(i, xx):
        o = fn(xx)
        return xx + (jnp.sum(o, dtype=jnp.float32) * 1e-9).astype(xx.dtype)
    return jax.jit(lambda x: jnp.float32(
        jax.lax.fori_loop(0, reps, body, x).sum()))


def _chain_i8(fn, reps):
    """Same for an int8 carry: feed the low bit of the checksum back so the
    loop body cannot be hoisted (perturbs a few values by +-1)."""
    def body(i, xx):
        o = fn(xx)
        return xx ^ (jnp.sum(o) & 1).astype(jnp.int8)
    return jax.jit(lambda x: jnp.int32(
        jax.lax.fori_loop(0, reps, body, x).astype(jnp.int32).sum()))


def bench_shape(shape, reps=50, runs=7):
    b_, hh, ww, cin, cout = shape
    x = jax.random.normal(jax.random.PRNGKey(0), (b_, hh, ww, cin),
                          jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout),
                          jnp.bfloat16) * 0.05
    bias = jnp.zeros((cout,), jnp.bfloat16)
    w_i8, s_w = quantize_weight(w)
    x_i8, _ = quantize_act(x)

    def raw(xx):
        return jax.lax.conv_general_dilated(
            xx, w_i8, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)

    fns = {
        "bf16": (_chain_f(lambda z: conv3x3_xla(z, w, bias), reps), x),
        "int8_dyn": (_chain_f(lambda z: conv3x3_int8(z, w, bias), reps), x),
        "int8_pt": (_chain_f(
            lambda z: conv3x3_int8(z, w, bias, per_sample=False), reps), x),
        "int8_st": (_chain_f(
            lambda z: conv3x3_int8(z, w, bias, act_amax=6.0), reps), x),
        "int8_raw": (_chain_i8(raw, reps), x_i8),
    }
    errors, times = {}, {}
    for k, (f, inp) in list(fns.items()):
        try:
            _ = float(f(inp))
            times[k] = []
        except Exception as e:
            errors[k] = f"{type(e).__name__}: {str(e)[:200]}"
            del fns[k]
    for _ in range(runs):
        for k, (f, inp) in fns.items():
            t0 = time.time()
            _ = float(f(inp))
            times[k].append(time.time() - t0)
    med = {k: sorted(v)[len(v) // 2] / reps for k, v in times.items()}
    flops = 2 * b_ * hh * ww * 9 * cin * cout
    out = {"shape": list(shape)}
    for k, t in med.items():
        out[f"{k}_ms"] = round(t * 1e3, 4)
        out[f"{k}_tflops"] = round(flops / t / 1e12, 1)
    for k, msg in errors.items():
        out[f"{k}_error"] = msg
    if "bf16" in med:
        for k in ("int8_dyn", "int8_pt", "int8_st", "int8_raw"):
            if k in med:
                out[f"{k}_speedup"] = round(med["bf16"] / med[k], 3)
    return out


NIN_SHAPES = [
    (64, 32, 32, 128, 128),   # attention NINs / res-32 shortcut
    (64, 16, 16, 256, 256),   # res-16 attention NINs
    (64, 32, 32, 256, 128),   # up-path 1x1 shortcut (concat input)
]


def bench_nin(shape, reps=50, runs=7):
    """Per-op cell for the ``int8_all[_static]`` wide modes: the 1x1/NIN
    channel matmul — bf16 einsum control vs the dynamic and static int8
    paths (the dynamic wide mode lost in-model on its riders,
    bench_int8_wide.json; static deletes them)."""
    b_, hh, ww, cin, cout = shape
    x = jax.random.normal(jax.random.PRNGKey(0), (b_, hh, ww, cin),
                          jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (cin, cout),
                          jnp.bfloat16) * 0.05
    bias = jnp.zeros((cout,), jnp.bfloat16)

    fns = {
        "bf16": _chain_f(
            lambda z: jnp.einsum("...c,cd->...d", z, w) + bias, reps),
        "int8_dyn": _chain_f(lambda z: conv1x1_int8(z, w, bias), reps),
        "int8_st": _chain_f(
            lambda z: conv1x1_int8(z, w, bias, act_amax=6.0), reps),
    }
    out = {"shape": ["nin", b_, hh, ww, cin, cout]}
    times = {}
    for k, f in fns.items():
        try:
            _ = float(f(x))
        except Exception as e:
            out[f"{k}_error"] = f"{type(e).__name__}: {str(e)[:200]}"
            continue
        ts = []
        for _ in range(runs):
            t0 = time.time()
            _ = float(f(x))
            ts.append(time.time() - t0)
        times[k] = sorted(ts)[len(ts) // 2] / reps
    flops = 2 * b_ * hh * ww * cin * cout
    for k, t in times.items():
        out[f"{k}_ms"] = round(t * 1e3, 4)
        out[f"{k}_tflops"] = round(flops / t / 1e12, 1)
    if "bf16" in times:
        for k in ("int8_dyn", "int8_st"):
            if k in times:
                out[f"{k}_speedup"] = round(times["bf16"] / times[k], 3)
    return out


def bench_gemm(n=4096, reps=30, runs=7):
    """Square-GEMM pin of the int8:bf16 MXU ratio (conv-schedule-free)."""
    a = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (n, n), jnp.bfloat16)
    a8 = jnp.clip(jnp.round(a.astype(jnp.float32) * 20), -127, 127
                  ).astype(jnp.int8)
    b8 = jnp.clip(jnp.round(b.astype(jnp.float32) * 20), -127, 127
                  ).astype(jnp.int8)

    f_bf = _chain_f(lambda z: z @ b, reps)
    f_i8 = _chain_i8(lambda z: jax.lax.dot_general(
        z, b8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32), reps)
    out = {"shape": ["gemm", n, n, n]}
    times = {}
    for k, (f, inp) in {"bf16": (f_bf, a), "int8_raw": (f_i8, a8)}.items():
        try:
            _ = float(f(inp))
        except Exception as e:
            out[f"{k}_error"] = f"{type(e).__name__}: {str(e)[:200]}"
            continue
        ts = []
        for _ in range(runs):
            t0 = time.time()
            _ = float(f(inp))
            ts.append(time.time() - t0)
        times[k] = sorted(ts)[len(ts) // 2] / reps
    flops = 2 * n ** 3
    for k, t in times.items():
        out[f"{k}_ms"] = round(t * 1e3, 4)
        out[f"{k}_tflops"] = round(flops / t / 1e12, 1)
    if "bf16" in times and "int8_raw" in times:
        out["int8_raw_speedup"] = round(times["bf16"] / times["int8_raw"], 3)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--runs", type=int, default=7)
    ap.add_argument("--gemm-only", action="store_true")
    ap.add_argument("--skip-gemm", action="store_true")
    a = ap.parse_args()
    if not a.skip_gemm:
        print(json.dumps(bench_gemm(reps=max(a.reps // 2, 5), runs=a.runs)),
              flush=True)
    if a.gemm_only:
        return
    for shape in SHAPES:
        print(json.dumps(bench_shape(shape, a.reps, a.runs)), flush=True)
    for shape in NIN_SHAPES:
        print(json.dumps(bench_nin(shape, a.reps, a.runs)), flush=True)


if __name__ == "__main__":
    main()
