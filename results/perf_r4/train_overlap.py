"""Native-loader prefetch vs sync against the REAL device train step
(VERDICT r3 task 2, closing PERF.md's host-sim caveat).

Builds a CIFAR-10-binary-format synthetic dataset on disk (same 3073-byte
records the real release uses), compiles ONE jitted train step (identical
construction to ``apps/train.py``), then times steady-state 100-step blocks
with the input pipeline in three modes:

* ``device_only`` — batch reused, no host input work (device roofline);
* ``sync``        — ``NativeBatchLoader.next_batch`` per step (host gather
                    serializes with dispatch);
* ``prefetch``    — ``prefetch_batches`` (C++ worker fills the next batch
                    while the device runs).

Blocks run sync→prefetch→sync→prefetch so chip drift cancels.  One JSON line.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from naturaldiffusion_tpu.data.native_loader import NativeBatchLoader
from naturaldiffusion_tpu.models.ncsnpp import NCSNpp, NCSNppConfig
from naturaldiffusion_tpu.sde import VPSDE
from naturaldiffusion_tpu.train import make_train_step

BATCH, STEPS = 128, 100
DATA = "/tmp/cifar_synth"


def synth_dataset():
    os.makedirs(DATA, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(1, 6):
        path = os.path.join(DATA, f"data_batch_{i}.bin")
        if os.path.exists(path):
            continue
        rec = rng.integers(0, 256, (10000, 3073), dtype=np.uint8)
        rec[:, 0] = rng.integers(0, 10, 10000)
        rec.tofile(path)
    return [os.path.join(DATA, f"data_batch_{i}.bin") for i in range(1, 6)]


def main():
    paths = synth_dataset()
    loader = NativeBatchLoader(paths, seed=1)
    assert loader.backend == "native", loader.backend

    model = NCSNpp(config=NCSNppConfig())
    params = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, 32, 32, 3), jnp.float32),
        jnp.zeros(1))["params"])(jax.random.PRNGKey(0))
    init_fn, step_fn = make_train_step(
        VPSDE(), lambda p, x, t: model.apply({"params": p}, x, t),
        lr=2e-4, warmup=5000, grad_clip=1.0)
    state = jax.jit(init_fn)(params)
    step = jax.jit(step_fn)

    key = jax.random.PRNGKey(7)
    img0, _ = loader.next_batch(BATCH)
    state, loss = step(state, key, jnp.asarray(img0))   # compile + warm
    if not np.isfinite(float(loss)):
        raise RuntimeError(f"non-finite warm loss {loss}")

    def run_block(batches):
        nonlocal state
        t0 = time.time()
        loss = None
        for i, img in enumerate(batches):
            state, loss = step(state, jax.random.fold_in(key, i),
                               jnp.asarray(img))
        lf = float(loss)                    # sync the whole block
        if not np.isfinite(lf):
            raise RuntimeError(f"non-finite loss {lf}")
        return (time.time() - t0) / STEPS

    def sync_batches():
        for _ in range(STEPS):
            yield loader.next_batch(BATCH)[0]

    def prefetch_batches():
        gen = loader.prefetch_batches(BATCH)
        for _ in range(STEPS):
            yield next(gen)[0]

    def device_only():
        for _ in range(STEPS):
            yield img0

    times = {"device_only": [], "sync": [], "prefetch": []}
    for name, mk in (("device_only", device_only),):
        times[name].append(run_block(mk()))
    for _ in range(2):                      # interleave vs chip drift
        times["sync"].append(run_block(sync_batches()))
        times["prefetch"].append(run_block(prefetch_batches()))

    # host-side gather cost alone, for the write-up
    t0 = time.time()
    for _ in range(50):
        loader.next_batch(BATCH)
    gather_ms = (time.time() - t0) / 50 * 1e3

    out = {"batch": BATCH, "steps_per_block": STEPS,
           "gather_ms_sync": round(gather_ms, 2)}
    for name, ts in times.items():
        out[f"{name}_step_ms"] = round(min(ts) * 1e3, 2)
        out[f"{name}_img_s"] = round(BATCH / min(ts), 1)
    out["overlap_speedup"] = round(
        min(times["sync"]) / min(times["prefetch"]), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
