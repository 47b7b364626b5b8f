"""On-chip compile+parity smoke for every Pallas conv formulation.

Round-3 ended with zero on-chip evidence for ops/conv3x3.py (PERF.md
"A/B pending hardware"); the one attempted run died in Mosaic
(tpu.concatenate offset mismatch, results/perf_r4/bench_mods1.err).
This maps WHICH formulations the real Mosaic toolchain accepts before
any timing ladder runs.
"""
import sys
import numpy as np
import jax
import jax.numpy as jnp

from naturaldiffusion_tpu.ops.conv3x3 import (
    conv3x3_pallas, conv3x3_xla, conv3x3_gn_pallas)

SHAPES = [
    ((4, 32, 32, 128), 128),    # CIFAR NCSN++ level-0 (hot)
    ((4, 16, 16, 256), 256),    # level-1
]

def check(name, fn, ref, atol=0.08):
    try:
        out = np.asarray(jax.block_until_ready(fn()))
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"  {name:28s} FAIL-COMPILE: {type(e).__name__}: {msg}")
        return False
    err = np.max(np.abs(out.astype(np.float64) - ref))
    ok = err < atol
    print(f"  {name:28s} {'ok' if ok else 'WRONG'}  maxerr={err:.2e}")
    return ok

def main():
    for shape, cout in SHAPES:
        print(f"shape {shape} -> {cout}")
        key = jax.random.PRNGKey(0)
        kx, kw, kb = jax.random.split(key, 3)
        x = jax.random.normal(kx, shape, jnp.bfloat16)
        w = (jax.random.normal(kw, (3, 3, shape[-1], cout), jnp.bfloat16)
             * 0.05)
        b = jax.random.normal(kb, (cout,), jnp.bfloat16) * 0.1
        ref = np.asarray(conv3x3_xla(x, w, b)).astype(np.float64)
        for v in ("taps9", "kstack", "valid9", "tiled", "tiledew"):
            check(v, lambda v=v: conv3x3_pallas(x, w, b, False, v), ref)
        # fused resblock form (valid9 + pre + skip + stats)
        bsz, cin = shape[0], shape[-1]
        pre = (jnp.ones((bsz, cin), jnp.float32) * 0.9,
               jnp.zeros((bsz, cin), jnp.float32))
        skip = jax.random.normal(jax.random.PRNGKey(9),
                                 (bsz, shape[1], shape[2], cout),
                                 jnp.bfloat16)
        xp = 0.9 * x.astype(jnp.float32)
        xs = (xp * jax.nn.sigmoid(xp)).astype(jnp.bfloat16)
        fref = (np.asarray(conv3x3_xla(xs, w, b)).astype(np.float64)
                + np.asarray(skip, np.float64)) * 0.7071067811865476
        def fused():
            y = conv3x3_gn_pallas(x, w, b, pre=pre, skip=skip,
                                  skip_rescale=True, emit_stats=True,
                                  interpret=False)
            return y[0]
        check("fused(pre+skip+stats)", fused, fref)

if __name__ == "__main__":
    sys.exit(main())
