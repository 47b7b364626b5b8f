"""FIR-family on-chip bench + profile (VERDICT r3 task 3).

Times the ``ve/cifar10_ncsnpp_continuous`` forward (fir=True,
progressive_input=residual — routes through ops/upfirdn2d.py) on the real
chip, vs its fir=False VP twin at identical width/depth, then captures an
xprof trace so trace_summary can rank where the upfirdn dilated convs land.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from naturaldiffusion_tpu.configs import get_config
from naturaldiffusion_tpu.models.ncsnpp import NCSNpp

BATCH, REPS, RUNS = 64, 8, 7


def build(name):
    cfg = get_config(name)
    model = NCSNpp(config=cfg.model)
    sz, ch = cfg.data.image_size, cfg.data.num_channels
    params = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, sz, sz, ch), jnp.float32),
        jnp.zeros(1))["params"])(jax.random.PRNGKey(0))
    p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    x = jax.random.normal(jax.random.PRNGKey(1), (BATCH, sz, sz, ch),
                          jnp.bfloat16)

    def fwd(z):
        return model.apply({"params": p16}, z,
                           jnp.full((z.shape[0],), 500.0, jnp.float32))

    def chain(z):
        def body(i, zz):
            o = fwd(zz)
            return zz + (jnp.sum(o, dtype=jnp.float32) * 1e-9).astype(zz.dtype)
        return jnp.float32(jax.lax.fori_loop(0, REPS, body, z).sum())

    return jax.jit(chain), x


def main():
    out = {}
    fns = {}
    for name in ("ve/cifar10_ncsnpp_continuous", "vp/cifar10_ddpmpp_continuous"):
        f, x = build(name)
        s = float(f(x))                       # compile + warm
        if not np.isfinite(s):
            raise RuntimeError(f"{name}: non-finite checksum {s}")
        fns[name] = (f, x)
    times = {k: [] for k in fns}
    for _ in range(RUNS):                     # interleave (chip drift)
        for name, (f, x) in fns.items():
            t0 = time.time()
            _ = float(f(x))
            times[name].append(time.time() - t0)
    for name, ts in times.items():
        med = sorted(ts)[len(ts) // 2] / REPS
        key = "fir" if name.startswith("ve/") else "nofir"
        out[f"{key}_fwd_ms"] = round(med * 1e3, 2)
        out[f"{key}_img_s"] = round(BATCH / med, 1)
    out["batch"] = BATCH
    print(json.dumps(out), flush=True)

    # one profiled dispatch of the FIR forward
    f, x = fns["ve/cifar10_ncsnpp_continuous"]
    with jax.profiler.trace("/tmp/fir_prof"):
        _ = float(f(x))
    print("trace -> /tmp/fir_prof", flush=True)


if __name__ == "__main__":
    sys.exit(main())
