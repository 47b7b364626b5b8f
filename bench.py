"""Headline benchmark: CIFAR-10 10-step Natural Inference throughput.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: the BASELINE.md driver target of 1000 images/sec/chip on v5e
(the reference publishes no wall-clock numbers — SURVEY.md §6), so
``vs_baseline`` is value/1000.

Config mirrors the reference FID sweep (``src/CIFAR10NaturalInference.py:
241-317``): NCSN++ VP backbone (random weights — identical FLOPs to
checkpoint_8.pth), 10-step learned/derived NI matrix, batch 512, bf16
activations, f32 coefficient accumulation.
"""

from __future__ import annotations

import json
import os
import sys
import time

# keep the axon plugin path if the caller exported a bare PYTHONPATH
if os.path.isdir("/root/.axon_site") and \
        "/root/.axon_site" not in os.environ.get("PYTHONPATH", ""):
    sys.path.append("/root/.axon_site")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax                                    # noqa: E402
import jax.numpy as jnp                       # noqa: E402
import numpy as np                            # noqa: E402

BATCH = 512
NUM_STEP = 10
TARGET = 1000.0   # img/s/chip (BASELINE.md driver target)


def load_matrix():
    """Prefer the reference's learned 10-step weight matrix; fall back to the
    derived DDPM matrix (same shapes, same compute)."""
    from naturaldiffusion_tpu.coeffs.matrix import CoeffMatrix
    from naturaldiffusion_tpu.coeffs import registry
    path = "/root/reference/weights/step_10_weight_42.npz"
    if os.path.exists(path):
        try:
            return CoeffMatrix.load(path)
        except Exception:
            pass
    return registry.derive("ddpm", NUM_STEP)


def main():
    from naturaldiffusion_tpu.models.ncsnpp import (NCSNpp,
                                                    CIFAR10_DDPMPP_CONTINUOUS)
    from naturaldiffusion_tpu.engine import NISchedule, natural_inference

    model = NCSNpp(config=CIFAR10_DDPMPP_CONTINUOUS)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (BATCH, 32, 32, 3), jnp.float32)
    t0 = jnp.full((BATCH,), 500.0, jnp.float32)
    params = jax.jit(lambda k: model.init(k, x0[:1], t0[:1])["params"])(
        jax.random.PRNGKey(1))
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)

    sched = NISchedule.from_matrix(load_matrix())

    def score_as_x0(z, t):
        # score network -> predicted x0, the data_fn conversion
        # (src/CIFAR10NaturalInference.py:219-230) folded into the engine's
        # `score` prediction type; t is the discrete node index (999..0)
        return model.apply({"params": params},
                           z.astype(jnp.bfloat16),
                           jnp.full((z.shape[0],), t, jnp.float32))

    # the jitted executable reduces to a checksum so timing forces full
    # execution + a scalar host transfer — block_until_ready alone does not
    # reliably synchronize through the TPU tunnel
    run = jax.jit(lambda z, k: natural_inference(
        score_as_x0, sched, z, key=k, prediction_type="eps",
        model_dtype=jnp.bfloat16))
    run_sum = jax.jit(lambda z, k: jnp.float32(run(z, k).sum()))

    k = jax.random.PRNGKey(2)
    out = run(x0, k)                            # full output for finiteness
    _ = float(run_sum(x0, k))                   # compile + warm
    # per-iteration timing, median of 5 (the tunnel adds noisy RPC latency)
    times = []
    for i in range(5):
        ki = jax.random.fold_in(k, i)
        t0_ = time.time()
        _ = float(run_sum(x0, ki))
        times.append(time.time() - t0_)
    dt = sorted(times)[len(times) // 2]
    img_per_sec = BATCH / dt

    assert np.isfinite(np.asarray(out, np.float32)).all()
    print(json.dumps({
        "metric": "cifar10_ni10_img_per_sec_per_chip",
        "value": round(float(img_per_sec), 2),
        "unit": "img/s",
        "vs_baseline": round(float(img_per_sec) / TARGET, 4),
    }))


if __name__ == "__main__":
    main()
