"""Pallas ring-buffer scan at n=500 on hardware (VERDICT r3 task 8).

The 3-4x claim for ops/weighted_sum.fused_weighted_sum_pallas was measured
at n=100-200; the corpus goes to 500 (results/corpus/ddpm/ddpm_500.npz
twin of /root/reference/results/ddpm/ddpm_500.csv).  One chip measurement
at n=500 (pallas ring vs XLA weighted-sum scan) + parity against the
float64 NumPy oracle loop.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from naturaldiffusion_tpu.coeffs import registry
from naturaldiffusion_tpu.engine import NISchedule, natural_inference
from naturaldiffusion_tpu.engine.ni import natural_inference_reference

N, BATCH = 500, 64


def main():
    m = registry.derive("ddim", N)
    sched = NISchedule.from_matrix(m)
    W = np.asarray(jax.random.normal(jax.random.PRNGKey(3), (3, 3),
                                     jnp.float32)) * 0.1

    def x0_fn(z, t, mods=None):
        zw = jnp.einsum("...ij,jk->...ik", z, jnp.asarray(W, z.dtype),
                        precision=jax.lax.Precision.HIGHEST)
        return jnp.tanh(zw) * (1.0 + 0.001 * t)

    z0 = jax.random.normal(jax.random.PRNGKey(0), (BATCH, 32, 32, 3),
                           jnp.float32)

    fns = {}
    for label, use_pallas in (("pallas_ring", True), ("xla_scan", False)):
        fns[label] = jax.jit(lambda z, up=use_pallas: jnp.float32(
            natural_inference(x0_fn, sched, z, prediction_type="x0",
                              unroll=False, use_pallas=up).sum()))
    outs = {}
    for label, f in fns.items():
        outs[label] = float(f(z0))            # compile + warm
        if not np.isfinite(outs[label]):
            raise RuntimeError(f"{label}: non-finite {outs[label]}")
    times = {k: [] for k in fns}
    for _ in range(5):
        for label, f in fns.items():
            t0 = time.time()
            _ = float(f(z0))
            times[label].append(time.time() - t0)
    res = {"n": N, "batch": BATCH}
    for label, ts in times.items():
        med = sorted(ts)[len(ts) // 2]
        res[f"{label}_s"] = round(med, 3)
        res[f"{label}_img_s"] = round(BATCH / med, 1)
    res["speedup"] = round(res["xla_scan_s"] / res["pallas_ring_s"], 2)

    # parity vs the float64 oracle on a 4-image slice
    z4 = np.asarray(z0[:4], np.float64)

    def x0_np(z, t):
        return np.tanh(z @ W.astype(np.float64)) * (1.0 + 0.001 * t)

    ref = natural_inference_reference(x0_np, m, z4, prediction_type="x0")
    got = np.asarray(jax.jit(
        lambda z: natural_inference(x0_fn, sched, z, prediction_type="x0",
                                    unroll=False, use_pallas=True))(
        z0[:4]), np.float64)
    res["oracle_mae"] = float(np.abs(got - ref).max())
    print(json.dumps(res))
    if res["oracle_mae"] > 2e-4:
        raise SystemExit(f"parity vs fp64 oracle failed: {res['oracle_mae']}")


if __name__ == "__main__":
    sys.exit(main())
