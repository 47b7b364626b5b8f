"""Verify drive: r5 quant path + engine regression on the real chip."""
import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices())

# 1. coeff matrix + marginals
from naturaldiffusion_tpu.coeffs import registry
m = registry.derive("ddpm", 10)
sig_err, noi_err = m.marginal_errors()
# discretized family: marginal error shrinks with step count, ~1e-3 at n=10
# (tests/test_golden_matrices.py::test_marginal_invariants tolerance model)
assert sig_err.max() < 0.05 and noi_err.max() < 0.05, (sig_err, noi_err)
mf = registry.derive("flow_euler", 10)
fs, fn_ = mf.marginal_errors()
assert fs.max() < 1e-10 and fn_.max() < 1e-10, (fs, fn_)  # exact family
print("1. marginals ok (ddpm-10 discretization bound + flow exactness)")

# 2+3. jitted NI on toy denoiser vs direct recursion (ddim, deterministic)
from naturaldiffusion_tpu.engine import NISchedule, natural_inference
from naturaldiffusion_tpu.samplers import direct

sched = NISchedule.from_matrix(m)          # ddpm (stochastic) for 5b
md = registry.derive("ddim", 10)
sched_d = NISchedule.from_matrix(md)
def x0_fn(z, t, *a):
    return 0.1 * z
z0 = jax.random.normal(jax.random.PRNGKey(0), (8, 32, 32, 3), jnp.float32)
k = jax.random.PRNGKey(1)
out = jax.jit(lambda z: natural_inference(
    x0_fn, sched_d, z, prediction_type="x0"))(z0)
assert np.isfinite(np.asarray(out)).all()
want = direct.ddim(x0_fn, 10, z0, dtype=jnp.float64)
err = float(jnp.abs(out - jnp.asarray(np.asarray(want), jnp.float32)).max())
assert err < 1e-4, err
print(f"2/3. NI finite + == direct ddim recursion (err {err:.2e})")

# 4. quant conv COMPILED on chip vs numpy oracle
from naturaldiffusion_tpu.ops.quant import (conv3x3_int8, quantize_act,
                                            quantize_weight)
x = jax.random.normal(jax.random.PRNGKey(2), (4, 16, 16, 128), jnp.float32)
w = jax.random.normal(jax.random.PRNGKey(3), (3, 3, 128, 128),
                      jnp.float32) * 0.05
b = jax.random.normal(jax.random.PRNGKey(4), (128,), jnp.float32) * 0.1
y = jax.jit(lambda x, w, b: conv3x3_int8(x, w, b))(x, w, b)
# numpy oracle on the SAME quantized operands: the int path must be exact
w_i8, s_w = jax.jit(quantize_weight)(w)
x_i8, s_x = jax.jit(quantize_act)(x)
xi = np.asarray(x_i8, np.int64)
wi = np.asarray(w_i8, np.int64)
xp = np.pad(xi, ((0, 0), (1, 1), (1, 1), (0, 0)))
acc = np.zeros((4, 16, 16, 128), np.int64)
for dy in range(3):
    for dx in range(3):
        acc += np.einsum("bhwc,cd->bhwd", xp[:, dy:dy+16, dx:dx+16, :],
                         wi[dy, dx], optimize=True)
oracle = (acc.astype(np.float64) * np.asarray(s_x, np.float64)
          * np.asarray(s_w, np.float64).reshape(1, 1, 1, -1)
          + np.asarray(b, np.float64))
err = np.abs(np.asarray(y, np.float64) - oracle).max() / (
    np.abs(oracle).max() + 1e-12)
assert err < 1e-3, err
print(f"4a. int8 conv compiled == numpy int oracle (rel err {err:.2e})")

# 4a'. static-scale variant compiled on chip: close to the float conv
from naturaldiffusion_tpu.ops.conv3x3 import conv3x3_xla
y_s = jax.jit(lambda x, w: conv3x3_int8(x, w, act_amax=6.0))(x, w)
y_f = jax.jit(lambda x, w: conv3x3_xla(x, w, None))(x, w)
rel = float(jnp.abs(y_s - y_f).max() / (jnp.abs(y_f).max() + 1e-12))
assert np.isfinite(np.asarray(y_s)).all() and rel < 3e-2, rel
print(f"4a'. int8_static conv compiled, rel err vs float {rel:.2e}")

# 4a''. weight-only-int8 Pallas matmul COMPILED (Mosaic, not interpret)
from naturaldiffusion_tpu.ops.qmatmul import matmul_wdq
from naturaldiffusion_tpu.ops.quant import quantize_weight as _qw
xm = jax.random.normal(jax.random.PRNGKey(8), (256, 1152), jnp.bfloat16)
wm = jax.random.normal(jax.random.PRNGKey(9), (1152, 4608),
                       jnp.float32) * 0.03
wi, sw = _qw(wm, axis=-1)
ym = matmul_wdq(xm, wi, sw.reshape(-1))
ref = (np.asarray(xm, np.float64)
       @ (np.asarray(wi, np.float64) * np.asarray(sw, np.float64)))
relm = np.abs(np.asarray(ym, np.float64) - ref).max() / (
    np.abs(ref).max() + 1e-12)
assert relm < 2e-2, relm
print(f"4a''. w8 Pallas matmul compiled == dequant oracle (rel {relm:.2e})")

# 4b. model-level quant forward on chip: finite + close to float path
import os
from naturaldiffusion_tpu.models.ncsnpp import NCSNpp, CIFAR10_DDPMPP_CONTINUOUS
model = NCSNpp(config=CIFAR10_DDPMPP_CONTINUOUS)
xm = jax.random.normal(jax.random.PRNGKey(5), (8, 32, 32, 3), jnp.float32)
t = jnp.full((8,), 500.0, jnp.float32)
params = jax.jit(lambda k: model.init(k, xm[:1], t[:1])["params"])(
    jax.random.PRNGKey(6))
p16 = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
yf = jax.jit(lambda z: model.apply({"params": p16}, z.astype(jnp.bfloat16),
                                   t))(xm)
os.environ["NATDIFF_QUANT"] = "int8"
yq = jax.jit(lambda z: model.apply({"params": p16}, z.astype(jnp.bfloat16),
                                   t))(xm)
os.environ.pop("NATDIFF_QUANT")
a = np.asarray(yf, np.float64).ravel()
c = np.asarray(yq, np.float64).ravel()
assert np.isfinite(c).all()
cos = a @ c / (np.linalg.norm(a) * np.linalg.norm(c) + 1e-12)
assert cos > 0.99, cos
print(f"4b. NCSN++ quant forward on chip finite, cos {cos:.5f}")

# 5. error paths
try:
    natural_inference(x0_fn, sched, z0, key=k, prediction_type="nope")
    raise SystemExit("bad prediction_type not rejected")
except (ValueError, KeyError, NotImplementedError) as e:
    print("5a. bad prediction_type rejected:", type(e).__name__)
try:
    natural_inference(x0_fn, sched, z0, prediction_type="x0")  # ddpm, no key
    raise SystemExit("stochastic schedule without key not rejected")
except ValueError as e:
    print("5b. stochastic schedule w/o key rejected:", type(e).__name__)

print("DRIVE OK")
