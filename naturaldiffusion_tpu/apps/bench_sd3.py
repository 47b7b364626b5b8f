"""SD3-medium NI throughput on one chip — the reference's headline model.

Runs the full 28-step sharpness-control loop (CFG pair per step, joint
attention at 4096+context tokens for 1024px) with random weights (identical
FLOPs to the safetensors) in bf16, as ONE jitted engine executable.

    python -m naturaldiffusion_tpu.apps.bench_sd3 [--latent 128] [--steps 28]

Prints one JSON line with sec/image and the transformer-forward ms.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..coeffs.sd3 import sd3_euler_weights, sd3_weight_matrix
from ..apps.sd3_ni import make_cfg_fwd, make_cfg_fwd_mods
from ..engine import NISchedule, natural_inference
from ..models.mmdit import MMDiT, MMDiTConfig, SD3_MEDIUM


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--latent", type=int, default=128,
                   help="latent H=W (128 = 1024px, 64 = 512px)")
    p.add_argument("--steps", type=int, default=28)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--ctx", type=int, default=154,
                   help="context tokens (CLIP 77+77; +T5 for 333)")
    p.add_argument("--trace", default=None,
                   help="capture an xprof trace of one timed run here "
                        "(summarize: python -m naturaldiffusion_tpu."
                        "utils.trace_summary <dir>)")
    p.add_argument("--no-mods", action="store_true",
                   help="disable the precomputed-conditioning fast path "
                        "(A/B control: recompute adaLN mods every step)")
    p.add_argument("--toy", action="store_true",
                   help="tiny MMDiT (smoke tests — timing meaningless)")
    p.add_argument("--flops-only", action="store_true",
                   help="(internal) print FLOPs of one CFG forward on the "
                        "CPU platform and exit")
    args = p.parse_args(argv)
    if args.flops_only:
        jax.config.update("jax_platforms", "cpu")

    cfg = SD3_MEDIUM
    if args.toy:
        cfg = MMDiTConfig(sample_size=max(args.latent, 8), patch_size=2,
                          in_channels=4, hidden_size=64, depth=2,
                          num_heads=2, caption_projection_dim=64,
                          joint_attention_dim=32, pooled_projection_dim=32,
                          pos_embed_max_size=16)
    model = MMDiT(config=cfg)
    b, hw = args.batch, args.latent
    key = jax.random.PRNGKey(0)
    noises = jax.random.normal(key, (b, hw, hw, cfg.in_channels), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(1),
                            (b, args.ctx, cfg.joint_attention_dim),
                            jnp.bfloat16) * 0.02
    pooled = jax.random.normal(jax.random.PRNGKey(2),
                               (b, cfg.pooled_projection_dim),
                               jnp.bfloat16) * 0.02

    if args.flops_only:
        shapes = jax.eval_shape(lambda k: model.init(
            k, noises[:1], jnp.zeros(1), ctx[:1].astype(jnp.float32),
            pooled[:1].astype(jnp.float32))["params"], jax.random.PRNGKey(3))
        params = jax.tree.map(lambda s: jnp.zeros(s.shape, jnp.bfloat16),
                              shapes)
    else:
        params = jax.jit(lambda k: model.init(
            k, noises[:1], jnp.zeros(1), ctx[:1].astype(jnp.float32),
            pooled[:1].astype(jnp.float32))["params"])(jax.random.PRNGKey(3))
        params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    n_par = sum(a.size for a in jax.tree.leaves(params))

    w = sd3_euler_weights(args.steps)
    sched = NISchedule.from_matrix(sd3_weight_matrix(w, args.steps))

    # auditable MFU denominator: FLOPs of ONE CFG step-forward in the mode
    # actually timed (see bench_dit.py / bench.py for the pattern)
    from ..utils.flops import (V5E_BF16_PEAK, flops_from_lowered,
                               flops_via_cpu_subprocess)

    def _one_step():
        z = noises.astype(jnp.bfloat16)
        if args.no_mods:
            def f(p, zz):
                fwd = make_cfg_fwd(model, p, context=ctx, pooled=pooled,
                                   neg_context=jnp.zeros_like(ctx),
                                   neg_pooled=jnp.zeros_like(pooled))
                return fwd(zz, 0.5)
            return f, (params, z)

        # the hoisted conditioning is computed once per RUN, not per step —
        # build the per-step mods slice outside so the one-step cost counts
        # only the in-loop work (the hoist chain inside f is unused and DCEd
        # before compiled-cost analysis)
        _, aux0 = make_cfg_fwd_mods(
            model, params, context=ctx, pooled=pooled,
            neg_context=jnp.zeros_like(ctx),
            neg_pooled=jnp.zeros_like(pooled),
            t_all=sched.node[:args.steps, 0])
        m0 = jax.tree.map(lambda a_: a_[0], aux0)

        def f(p, zz, mods):
            fwd, _ = make_cfg_fwd_mods(
                model, p, context=ctx, pooled=pooled,
                neg_context=jnp.zeros_like(ctx),
                neg_pooled=jnp.zeros_like(pooled),
                t_all=sched.node[:args.steps, 0])
            return fwd(zz, 0.5, mods)
        return f, (params, z, m0)

    f1, fargs = _one_step()
    flops_fwd = flops_from_lowered(jax.jit(f1).lower(*fargs))
    if args.flops_only:
        if flops_fwd is None:
            raise RuntimeError("cost analysis unavailable on CPU platform")
        print(flops_fwd)
        return 0
    if flops_fwd is None:
        sub = ["--latent", str(hw), "--steps", str(args.steps),
               "--batch", str(b), "--ctx", str(args.ctx)]
        sub += ["--no-mods"] if args.no_mods else []
        sub += ["--toy"] if args.toy else []
        flops_fwd = flops_via_cpu_subprocess(
            "naturaldiffusion_tpu.apps.bench_sd3", sub)
        flops_source = "cpu_compiled"
    else:
        flops_source = "lowering"

    # scan, not unroll (28 unrolled 2B-transformer copies is an
    # unreasonable XLA graph), and params as a jit ARGUMENT (closure
    # capture bakes 4GB of constants into the executable)
    def body(p, z):
        if args.no_mods:
            fwd = make_cfg_fwd(model, p, context=ctx, pooled=pooled,
                               neg_context=jnp.zeros_like(ctx),
                               neg_pooled=jnp.zeros_like(pooled))
            aux = None
        else:
            fwd, aux = make_cfg_fwd_mods(
                model, p, context=ctx, pooled=pooled,
                neg_context=jnp.zeros_like(ctx),
                neg_pooled=jnp.zeros_like(pooled),
                t_all=sched.node[:args.steps, 0])
        return jnp.float32(natural_inference(
            fwd, sched, z, prediction_type="v_flow", unroll=False,
            step_inputs=aux).sum())

    runj = jax.jit(body)
    z0 = noises.astype(jnp.bfloat16)

    def run():
        return float(runj(params, z0))

    _ = run()                     # compile + warm
    ts = []
    for _ in range(3):
        t0 = time.time()
        chk = run()
        ts.append(time.time() - t0)
    dt = sorted(ts)[1]
    assert np.isfinite(chk)
    if args.trace:
        with jax.profiler.trace(args.trace):
            _ = run()
    print(json.dumps({
        "model": ("toy-mmdit" if args.toy else "SD3-medium")
                 + f" ({n_par/1e9:.2f}B params)",
        "latent": hw, "steps": args.steps, "batch": b,
        "sec_per_image": round(dt / b, 6),
        "transformer_fwd_ms": round(dt / (args.steps * 2 * b) * 1e3, 4),
        "img_per_min_per_chip": round(60.0 * b / dt, 2),
        "flops_per_fwd": flops_fwd,
        "flops_source": flops_source,
        "mfu": round(flops_fwd * args.steps / (dt * V5E_BF16_PEAK), 4),
    }))
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
