"""Score-SDE training-step throughput on one chip.

The reference's training substrate (``deps/score_sde_pytorch/run_lib.py:
127-173``, the loop that produced ``checkpoint_8.pth``) as a perf bench:
the full jitted train step — continuous DSM loss, value_and_grad through
NCSN++ VP, Adam + warmup + grad-clip, EMA — on CIFAR-shaped synthetic data.

    python -m naturaldiffusion_tpu.apps.bench_train [--batch 128] [--chain 8]

``--chain`` steps are run inside ONE jitted ``lax.scan`` (state carried,
keys folded per step) so the ~35 ms tunnel RPC amortizes and the timing is
honest through the axon tunnel (the final loss is fetched as the checksum).
FLOPs come from XLA cost analysis of ONE compiled step — never the scan:
HloCostAnalysis counts a loop body once, so scan_flops/chain silently
under-reports by ~chain x (the r4 bug this line documents);
training runs f32 (the reference's precision), so MFU is quoted against
BOTH the f32 and bf16 peaks.  Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..models.ncsnpp import NCSNpp, NCSNppConfig
from ..sde import VPSDE
from ..train import make_train_step

V5E_PEAK_BF16 = 197e12
V5E_PEAK_F32 = 49e12


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=128)   # reference default
    p.add_argument("--chain", type=int, default=8,
                   help="train steps per jitted dispatch (lax.scan)")
    p.add_argument("--nf", type=int, default=128)
    p.add_argument("--remat", action="store_true",
                   help="jax.checkpoint the model (HBM for FLOPs trade)")
    p.add_argument("--bf16", action="store_true",
                   help="mixed precision: bf16 fwd/bwd, f32 master state")
    p.add_argument("--micro", type=int, default=0,
                   help="gradient-accumulation chunk size (0 = monolithic); "
                        "the training twin of the inference micro-batch win")
    p.add_argument("--trace", default=None)
    args = p.parse_args(argv)

    model = NCSNpp(config=NCSNppConfig(nf=args.nf))
    x1 = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = jax.jit(lambda k: model.init(k, x1, jnp.zeros(1))["params"])(
        jax.random.PRNGKey(0))
    n_par = sum(a.size for a in jax.tree.leaves(params))

    def apply_fn(p_, x, t_label):
        return model.apply({"params": p_}, x, t_label)

    init_fn, step_fn = make_train_step(
        VPSDE(), apply_fn, warmup=5000, remat=args.remat,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
        micro=args.micro)
    # FLOPs always from the MONOLITHIC step: the micro path's grad-accum
    # scan would be counted once by HloCostAnalysis (the r4 while-loop bug
    # below), and the math is identical either way
    _, step_plain = make_train_step(
        VPSDE(), apply_fn, warmup=5000, remat=args.remat,
        compute_dtype=jnp.bfloat16 if args.bf16 else None)
    state = jax.jit(init_fn)(params)
    batch = jax.random.normal(jax.random.PRNGKey(1),
                              (args.batch, 32, 32, 3), jnp.float32)

    def chain(state, key, batch):
        def body(st, k):
            st, loss = step_fn(st, k, batch)
            return st, loss
        keys = jax.random.split(key, args.chain)
        state, losses = jax.lax.scan(body, state, keys)
        return state, losses[-1]

    runj = jax.jit(chain, donate_argnums=())   # tunnel rejects donation

    # Auditable MFU denominator: cost-analyze ONE step, not the scan.
    # HloCostAnalysis counts a while-loop body ONCE (trip count is not
    # multiplied in), so chain_flops/chain under-reports by ~chain x —
    # caught in r4 when the "f32 train step" came out at 11.6 TFLOP/s
    # while a lone forward at the same batch was already 2.6 TFLOP
    # (PERF.md, training-substrate section).
    comp1 = jax.jit(step_plain).lower(
        state, jax.random.PRNGKey(2), batch).compile()
    ca = comp1.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    flops_per_step = float(ca.get("flops", 0.0))

    state2, loss = runj(state, jax.random.PRNGKey(2), batch)
    assert np.isfinite(float(loss)), loss      # compile + warm + sanity
    ts = []
    for i in range(5):
        t0 = time.time()
        _, loss = runj(state, jax.random.fold_in(jax.random.PRNGKey(3), i),
                       batch)
        _ = float(loss)                        # forced scalar round trip
        ts.append(time.time() - t0)
    dt = sorted(ts)[2] / args.chain
    if args.trace:
        with jax.profiler.trace(args.trace):
            _, loss = runj(state, jax.random.PRNGKey(9), batch)
            _ = float(loss)

    tflops = flops_per_step / dt / 1e12
    print(json.dumps({
        "model": f"ncsnpp-vp ({n_par / 1e6:.1f}M params)",
        "batch": args.batch, "chain": args.chain, "remat": args.remat,
        "bf16": args.bf16, "micro": args.micro,
        "step_ms": round(dt * 1e3, 2),
        "img_per_sec": round(args.batch / dt, 1),
        "flops_per_step": flops_per_step,
        "flops_source": "compiled-single-step",   # ADVICE r3: auditability
        "tflops": tflops,
        "mfu_vs_f32_peak": tflops * 1e12 / V5E_PEAK_F32,
        "mfu_vs_bf16_peak": tflops * 1e12 / V5E_PEAK_BF16,
    }))
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
