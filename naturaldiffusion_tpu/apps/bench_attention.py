"""Micro-bench: flash attention vs einsum pair at MMDiT's real joint length.

SD3-medium drives joint attention over 4096 latent tokens + text context
(``src/SD3NaturalInference.py:210-213``) — with CLIP+T5 context of 154
tokens the joint length is 4250, which is NOT 128-aligned; the padded +
segment-masked flash path (ops/attention.py) must engage there.

Run on the TPU host:
    python -m naturaldiffusion_tpu.apps.bench_attention
Prints one JSON line per (T, backend) with ms/call and the speedup.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

from ..ops.attention import mha


_RPC = None


def _rpc_overhead() -> float:
    """Measured per-dispatch round-trip (not a hard-coded tunnel guess —
    ~35-40ms through axon, ~0 on a local host); clamped by the caller so a
    fast run can never go negative."""
    global _RPC
    if _RPC is None:
        f = jax.jit(lambda: jnp.float32(0.0))
        _ = float(f())
        ts = []
        for _ in range(5):
            t0 = time.time()
            _ = float(f())
            ts.append(time.time() - t0)
        _RPC = sorted(ts)[2]
    return _RPC



def bench(t: int, b: int = 2, h: int = 24, d: int = 64, reps: int = 20):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (b, h, t, d), jnp.bfloat16) for kk in ks)

    out = {}
    for backend in ("xla", "flash", "splash"):
        # chain reps inside ONE jit: per-dispatch tunnel RPC (~35-40ms)
        # otherwise swamps millisecond kernels
        def body(i, qq):
            o = mha(qq, k, v, backend=backend)
            return (qq + o * 1e-6).astype(qq.dtype)
        f = jax.jit(lambda q: jnp.float32(
            jax.lax.fori_loop(0, reps, body, q).sum()))
        _ = float(f(q))
        ts = []
        for _ in range(3):
            s = time.time()
            _ = float(f(q))
            ts.append(time.time() - s)
        out[backend] = max(sorted(ts)[1] - _rpc_overhead(),
                           sorted(ts)[1] * 0.05) / reps
    flops = 4 * b * h * t * t * d
    print(json.dumps({
        "t": t, "b": b, "h": h, "d": d,
        "xla_ms": round(out["xla"] * 1e3, 2),
        "flash_ms": round(out["flash"] * 1e3, 2),
        "splash_ms": round(out["splash"] * 1e3, 2),
        "speedup": round(out["xla"] / out["flash"], 2),
        "flash_tflops": round(flops / out["flash"] / 1e12, 1),
        "splash_tflops": round(flops / out["splash"] / 1e12, 1),
    }))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--lengths", type=int, nargs="+",
                    default=[4096, 4250, 4429])
    # 4250 = 4096 + 154 (SD3 CLIP77+77 context); 4429 = +T5-333 variant
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--heads", type=int, default=24)
    args = ap.parse_args(argv)
    for t in args.lengths:
        bench(t, b=args.batch, h=args.heads)


if __name__ == "__main__":
    main()
