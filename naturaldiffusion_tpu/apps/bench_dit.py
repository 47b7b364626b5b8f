"""DiT-XL/2 ImageNet-256 NI throughput on one chip.

The reference's DiT validation workload (``src/ValidateNaturalInference.py:
336-382``: DDIM skip-sampling == NI on DiT-XL/2) as an end-to-end inference
bench: n-step deterministic NI with the reference CFG wrapper (batch-doubled
call, guide-only-in_channels quirk), random weights (identical FLOPs to
``DiT-XL-2-256x256.pt``), bf16, ONE jitted scan executable.

    python -m naturaldiffusion_tpu.apps.bench_dit [--steps 50] [--batch 1]

Default path precomputes the schedule-constant conditioning
(``dit_schedule_mods``): at DiT's inference batch sizes the per-step adaLN
matmuls are MXU-starved and their weights are ~1/3 of per-step HBM reads.
``--no-mods`` is the A/B control.  Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..coeffs import registry
from ..engine import NISchedule, natural_inference
from ..models.dit import (DIT_CONFIGS, DiT, DiTConfig, dit_schedule_mods,
                          forward_with_cfg)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="DiT-XL/2")
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--batch", type=int, default=1,
                   help="images per run (model batch is 2x: CFG pair)")
    p.add_argument("--cfg-scale", type=float, default=4.0)
    p.add_argument("--no-mods", action="store_true",
                   help="recompute adaLN mods every step (A/B control)")
    p.add_argument("--trace", default=None)
    p.add_argument("--toy", action="store_true",
                   help="tiny DiT (smoke tests — timing meaningless)")
    p.add_argument("--flops-only", action="store_true",
                   help="(internal) print FLOPs of one CFG forward on the "
                        "CPU platform and exit")
    args = p.parse_args(argv)
    if args.flops_only:
        jax.config.update("jax_platforms", "cpu")

    cfg = DiTConfig(input_size=8, patch_size=2, in_channels=4,
                    hidden_size=64, depth=2, num_heads=2,
                    num_classes=10) if args.toy else DIT_CONFIGS[args.model]
    model = DiT(config=cfg)
    b, n = args.batch, args.steps
    cin = cfg.in_channels

    key = jax.random.PRNGKey(0)
    half = jax.random.normal(
        key, (b, cfg.input_size, cfg.input_size, cin), jnp.float32)
    # reference CFG convention: both batch halves carry the same latents,
    # labels are [cond..., null...] (src/ValidateNaturalInference.py:343-344)
    z0 = jnp.concatenate([half, half]).astype(jnp.bfloat16)
    labels = jax.random.randint(jax.random.PRNGKey(1), (b,), 0,
                                cfg.num_classes)
    y = jnp.concatenate([labels, jnp.full((b,), cfg.num_classes)])

    if args.flops_only:
        # shapes-only params: cost analysis needs no real init
        shapes = jax.eval_shape(lambda k: model.init(
            k, half[:1], jnp.zeros(1), jnp.zeros(1, jnp.int32))["params"],
            jax.random.PRNGKey(2))
        params = jax.tree.map(lambda s: jnp.zeros(s.shape, jnp.bfloat16),
                              shapes)
    else:
        params = jax.jit(lambda k: model.init(
            k, half[:1], jnp.zeros(1), jnp.zeros(1, jnp.int32))["params"])(
            jax.random.PRNGKey(2))
        params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    n_par = sum(a.size for a in jax.tree.leaves(params))

    sched = NISchedule.from_matrix(registry.derive("ddim", n))

    # FLOPs of ONE step-forward in the mode actually timed (mods slices
    # hoist the adaLN matmuls out of the loop, so the two modes have
    # different per-step FLOPs) — the auditable MFU denominator
    from ..utils.flops import (V5E_BF16_PEAK, flops_from_lowered,
                               flops_via_cpu_subprocess)

    def _one_step():
        def apply_fn(p_, xx, tt, yy, mods=None):
            return model.apply({"params": p_}, xx, tt, yy, mods=mods)
        if args.no_mods:
            def f(p_, zz):
                tb = jnp.full((zz.shape[0],), 500.0, jnp.float32)
                return forward_with_cfg(
                    lambda xx, tt, yy: apply_fn(p_, xx, tt, yy),
                    zz, tb, y, args.cfg_scale, cin)[..., :cin]
            return f, (params, z0)
        aux = dit_schedule_mods(model, params, sched.node[:n, 0], y)
        m0 = jax.tree.map(lambda a_: a_[0], aux)
        def f(p_, zz, mods):
            tb = jnp.full((zz.shape[0],), 500.0, jnp.float32)
            return forward_with_cfg(
                lambda xx, tt, yy: apply_fn(p_, xx, tt, yy, mods=mods),
                zz, tb, y, args.cfg_scale, cin)[..., :cin]
        return f, (params, z0, m0)

    f1, fargs = _one_step()
    flops_fwd = flops_from_lowered(jax.jit(f1).lower(*fargs))
    if args.flops_only:
        if flops_fwd is None:
            raise RuntimeError("cost analysis unavailable on CPU platform")
        print(flops_fwd)
        return 0
    if flops_fwd is None:
        sub = ["--model", args.model, "--steps", str(n), "--batch", str(b),
               "--cfg-scale", str(args.cfg_scale)]
        sub += ["--no-mods"] if args.no_mods else []
        sub += ["--toy"] if args.toy else []
        flops_fwd = flops_via_cpu_subprocess(
            "naturaldiffusion_tpu.apps.bench_dit", sub)
        flops_source = "cpu_compiled"
    else:
        flops_source = "lowering"

    def body(p_, z):
        def apply_fn(xx, tt, yy, mods=None):
            return model.apply({"params": p_}, xx, tt, yy, mods=mods)

        if args.no_mods:
            aux = None

            def fwd(zz, t):
                tb = jnp.full((zz.shape[0],), t, jnp.float32)
                out = forward_with_cfg(apply_fn, zz, tb, y,
                                       args.cfg_scale, cin)
                return out[..., :cin]
        else:
            aux = dit_schedule_mods(model, p_, sched.node[:n, 0], y)

            def fwd(zz, t, mods):
                tb = jnp.full((zz.shape[0],), t, jnp.float32)
                out = forward_with_cfg(
                    lambda xx, tt, yy: apply_fn(xx, tt, yy, mods=mods),
                    zz, tb, y, args.cfg_scale, cin)
                return out[..., :cin]

        return jnp.float32(natural_inference(
            fwd, sched, z, prediction_type="eps", unroll=False,
            step_inputs=aux).sum())

    runj = jax.jit(body)

    def run():
        return float(runj(params, z0))

    chk = run()                    # compile + warm
    ts = []
    for _ in range(5):
        t0 = time.time()
        chk = run()
        ts.append(time.time() - t0)
    dt = sorted(ts)[2]
    assert np.isfinite(chk)
    if args.trace:
        with jax.profiler.trace(args.trace):
            _ = run()
    print(json.dumps({
        "model": ("toy-dit" if args.toy else args.model)
                 + f" ({n_par/1e6:.0f}M params)",
        "steps": n, "batch": b, "mods": not args.no_mods,
        "sec_per_image": round(dt / b, 6),
        "transformer_fwd_ms": round(dt / (n * b) * 1e3, 4),
        "img_per_min_per_chip": round(60.0 * b / dt, 1),
        "flops_per_fwd": flops_fwd,
        "flops_source": flops_source,
        "mfu": round(flops_fwd * n / (dt * V5E_BF16_PEAK), 4),
    }))
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
