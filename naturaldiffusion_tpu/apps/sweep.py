"""CIFAR-10 sampler sweeps — the reference's FID grid drivers
(``deis_sampling_tx`` ``src/CIFAR10NaturalInference.py:122-238`` and
``dpm_solver_tx`` ``:331-412``) as one CLI.

Grids (identical to the reference, whose best rows are frozen in
``results/FID/*.csv``):

* deis: ts_phase in {t, rho} x method in {t_ab, rho_ab, rho_rk, ipndm} x
  ab_order in {1,2,3}
* dpmsolver / dpmsolver++: method in {singlestep, multistep} x order {1,2,3}

Each cell samples ``--num`` images through the jitted sampler and (with
``--fid-stats`` + Inception weights) records FID; without stats it records
throughput, so the sweep doubles as a perf matrix.  Output: one CSV.
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..models.ncsnpp import NCSNpp, CIFAR10_DDPMPP_CONTINUOUS
from ..schedules import LinearVPSDE
from ..samplers import deis as deis_mod
from ..samplers.dpm_solver import NoiseScheduleVP, DPMSolver, model_wrapper


def _model(args):
    model = NCSNpp(config=CIFAR10_DDPMPP_CONTINUOUS)
    # jitted init: one tunnel round trip instead of one RPC per primitive
    params = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, 32, 32, 3)), jnp.zeros(1))["params"])(
        jax.random.PRNGKey(0))
    if args.ckpt:
        from ..models.convert import fill_from_torch, load_torch_checkpoint
        params, _ = fill_from_torch(params,
                                    load_torch_checkpoint(args.ckpt))
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)

    def raw(x, t_cont):
        # continuous VP label convention: t * 999
        return model.apply({"params": params}, x.astype(jnp.bfloat16),
                           t_cont * 999.0).astype(jnp.float32)

    return raw


def _microbatch(fn, micro: int):
    """Map the sampler over VMEM-resident chunks inside the jit
    (64-image chunks: ~30% device-rate win on v5e, PERF.md)."""
    def run(x):
        bb = x.shape[0]
        if not micro or bb % micro or bb <= micro:
            return fn(x)
        zs = x.reshape(bb // micro, micro, *x.shape[1:])
        return jax.lax.map(fn, zs).reshape(x.shape)
    return run


def _filter_cells(args, cells):
    if not getattr(args, "only", None):
        return cells
    want = args.only.split(":")
    out = [c for c in cells
           if [str(v) for v in c.values()] == want]
    if not out:
        raise SystemExit(f"--only {args.only!r} matches no cell of "
                         f"{[':'.join(str(v) for v in c.values()) for c in cells]}")
    return out


def _make_runner(s, micro, cache):
    """Jit a cell's sampler.  Samplers exposing ``run``/``run_args`` (the
    DEIS AB families) get their coefficient tables passed as runtime
    arguments, and the jitted wrapper is cached by ``s.structure`` — all
    cells of one structure (e.g. every t_ab/ipndm order-3 cell at any
    ts_phase) then hit ONE compiled executable instead of paying a
    multi-minute tunnel compile per cell (PERF.md r4 sweep section).
    Sharing is sound because ``run`` is functionally identical for a given
    structure: same eps_fn, same order; only the table VALUES differ."""
    if not hasattr(s, "run"):
        return jax.jit(_microbatch(s, micro))
    data = tuple(jnp.asarray(a, jnp.float32) for a in s.run_args)
    jitted = cache.get(s.structure)
    if jitted is None:
        run = s.run
        jitted = jax.jit(lambda x, *d: _microbatch(
            lambda xx: run(xx, *d), micro)(x))
        cache[s.structure] = jitted
    return lambda x: jitted(x, *data)


def _sample_cells(args, cells, build_sampler):
    cells = _filter_cells(args, cells)
    rows = []
    cache = {}
    sink = getattr(args, "_sink", None)      # incremental CSV (see main)
    for cell in cells:
        cell_t0 = time.time()
        sampler = _make_runner(build_sampler(cell),
                               getattr(args, "micro", 64), cache)
        key = jax.random.PRNGKey(args.seed)
        imgs, t0 = [], None
        done = 0
        while done < args.num:
            b = min(args.batch, args.num - done)
            key, sub = jax.random.split(key)
            x = jax.random.normal(sub, (b, 32, 32, 3), jnp.float32)
            out = sampler(x)
            out.block_until_ready()
            if t0 is None:          # exclude the compile batch (time AND images)
                t0 = time.time()
                first = done + b
            imgs.append(np.asarray(out, np.float32))
            done += b
        rate = (done - first) / max(time.time() - t0, 1e-9) \
            if done > first else float("nan")
        imgs = np.concatenate(imgs)
        # weights-provenance stamp (VERDICT r2 weak #5): a random-init sweep
        # CSV must be unmistakable for a real-checkpoint one
        row = {"weights": "converted" if args.ckpt else "random", **cell}
        row["img_per_sec"] = round(rate, 2)
        # end-to-end cell wall-clock INCLUDING its compile share; img_per_sec
        # above is steady-state (first/compile batch excluded) — both matter
        # for grid planning, so both go in the CSV
        row["wall_s"] = round(time.time() - cell_t0, 1)
        row["finite"] = bool(np.isfinite(imgs).all())
        if args.fid_stats:
            from ..eval.fid import fid_from_samples
            row["fid"] = round(fid_from_samples(imgs, args.fid_stats), 3)
        rows.append(row)
        print(row)
        if sink is not None:
            sink(rows)
    return rows


def sweep_deis(args):
    raw = _model(args)
    if args.discrete:
        # the reference builds DEIS on DiscreteVPSDE from the model's alphas
        # (src/CIFAR10NaturalInference.py:122-160); time = integer steps
        from ..schedules import PiecewiseVPSDE
        betas = np.linspace(0.1 / 1000, 20.0 / 1000, 1000)
        sde = PiecewiseVPSDE.from_betas(betas)
    else:
        sde = LinearVPSDE()

    # model label convention: continuous t*999 vs discrete integer index
    scale = 1.0 / 999.0 if args.discrete else 1.0

    def eps_fn(x, t):
        return raw(x, jnp.broadcast_to(jnp.asarray(t, jnp.float32) * scale,
                                       (x.shape[0],)))

    cells = []
    for ts_phase in ("t", "rho"):
        for method in ("t_ab", "rho_ab", "rho_rk", "ipndm"):
            if method == "ipndm" and ts_phase != "t":
                continue
            for order in (1, 2, 3):
                if method == "rho_rk" and order != 3:
                    continue   # rk grid keyed by tableau, not ab_order
                if method == "ipndm" and order != 3:
                    continue   # ipndm has no order knob (fixed AB-3 ramp)
                cells.append({"ts_phase": ts_phase, "method": method,
                              "ab_order": order})

    t0 = 0.0 if args.discrete else 1e-3

    def build(cell):
        if cell["method"] == "ipndm":
            return deis_mod.get_sampler_ipndm(sde, eps_fn, args.steps, t0=t0)
        return deis_mod.get_sampler(
            sde, eps_fn, cell["ts_phase"], 2.0, args.steps,
            method=cell["method"], ab_order=cell["ab_order"],
            rk_method="3kutta", t0=t0)

    return _sample_cells(args, cells, build)


def sweep_dpmsolver(args, algorithm: str):
    raw = _model(args)
    ns = NoiseScheduleVP(schedule="linear")
    model_fn = model_wrapper(raw, ns, model_type="noise")
    solver = DPMSolver(model_fn, ns, algorithm_type=algorithm)

    cells = [{"method": m, "order": o}
             for m in ("singlestep", "multistep") for o in (1, 2, 3)
             if not (m == "multistep" and o > args.steps)]

    def build(cell):
        return lambda x: solver.sample(
            x, steps=args.steps, order=cell["order"],
            method=cell["method"], t_end=1e-3)

    return _sample_cells(args, cells, build)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--family", choices=("deis", "dpmsolver", "dpmsolverpp"),
                   required=True)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--num", type=int, default=512)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--micro", type=int, default=64,
                   help="VMEM-resident chunk size inside the jit (0=off)")
    p.add_argument("--seed", type=int, default=888)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--fid-stats", default=None)
    p.add_argument("--only", default=None,
                   help="run one cell: 'method:order' (dpm families) or "
                        "'ts_phase:method:order' (deis) — single-cell runs "
                        "keep tunnel compile time bounded")
    p.add_argument("--discrete", action="store_true",
                   help="DEIS on the piecewise discrete-alpha schedule "
                        "(the reference FID-sweep setup)")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    out = args.out or f"results/FID/{args.family}_{args.steps}step_sweep.csv"
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)

    def sink(rows):
        # rewrite after every cell: a preempted grid run still leaves a
        # resumable artifact (finish the rest with --only; VERDICT r3 #4)
        with open(out, "w", newline="") as fh:
            w = csv.DictWriter(fh, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)
    args._sink = sink

    if args.family == "deis":
        rows = sweep_deis(args)
    else:
        rows = sweep_dpmsolver(
            args, "dpmsolver" if args.family == "dpmsolver"
            else "dpmsolver++")
    sink(rows)
    print(f"-> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
