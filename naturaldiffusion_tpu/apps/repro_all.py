"""One-command reproduction driver (VERDICT r4 next #8).

Regenerates the repo's headline artifacts from scratch so a stranger can
audit "complete" without reading 19 app CLIs:

    python -m naturaldiffusion_tpu.apps.repro_all --out results_repro

CPU-safe by default (forces the cpu platform unless ``--chip``): the corpus,
analyzer validation, DiT NI validation, and a toy-scale FID self-check run
in CI time.  ``--chip`` adds the hardware benches (headline bench.py, the
quant/conv op A/Bs, a small NI sweep cell) on the real TPU through the
tunnel — these pay multi-minute first compiles.

Each step is a subprocess with its own log under ``<out>/logs/``; a summary
table (step, rc, seconds) prints at the end and the exit code is the number
of failed steps.  Reference workloads reproduced: the coefficient corpus of
``src/*Analyze*.py`` (results/corpus), the NI==solver validation of
``src/ValidateNaturalInference.py``, and the FID machinery self-consistency
of ``src/CIFAR10NaturalInference.py`` at toy scale.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def _cpu_mod(mod: str, *args: str):
    """Run a module on the CPU platform.  ``JAX_PLATFORMS=cpu`` alone is NOT
    enough: the image's sitecustomize pins ``jax_platforms=axon`` at config
    level (see tests/conftest.py), so the override must also be config-level,
    before the module's first device touch."""
    code = ("import sys, jax, runpy\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            f"sys.argv = [{mod!r}] + {list(args)!r}\n"
            f"runpy.run_module({mod!r}, run_name='__main__')\n")
    return [sys.executable, "-c", code]


def _steps(out: str, chip: bool, quick: bool):
    py = [sys.executable, "-m"]
    steps = [
        ("corpus", _cpu_mod("naturaldiffusion_tpu.apps.analyze", "--all",
                            "--outdir", f"{out}/corpus")),
        ("validate_analyzers", _cpu_mod("naturaldiffusion_tpu.apps.validate")),
        ("validate_dit", _cpu_mod("naturaldiffusion_tpu.apps.validate_dit",
                                  "--small", "--steps", "8")),
        ("fid_selfcheck_toy", _cpu_mod(
            "naturaldiffusion_tpu.apps.fid_selfcheck",
            "--toy", "--num", "256", "--batch", "128",
            "--micro", "64", "--steps", "5",
            "--out", f"{out}/FID/selfcheck_toy.csv")),
        ("visualize", _cpu_mod("naturaldiffusion_tpu.viz.visualize",
                               f"{out}/corpus/VisualizeCoeffMatrix.html")),
    ]
    if chip:
        steps += [
            ("bench_headline", [sys.executable, "bench.py"]),
            ("bench_quant_ops", py + ["naturaldiffusion_tpu.apps."
                                      "bench_quant_ops", "--reps", "20",
                                      "--runs", "5"]),
            ("quant_accuracy", py + ["naturaldiffusion_tpu.apps."
                                     "quant_accuracy",
                                     "--out", f"{out}/quant_accuracy.json"]),
            ("sweep_cell", py + ["naturaldiffusion_tpu.apps.sweep",
                                 "--family", "deis", "--num", "256",
                                 "--batch", "256",
                                 "--only", "t:t_ab:1",
                                 "--out", f"{out}/FID/repro_deis_cell.csv"]),
        ]
    return steps


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="results_repro")
    p.add_argument("--chip", action="store_true",
                   help="also run the TPU hardware benches (tunnel compiles)")
    p.add_argument("--quick", action="store_true",
                   help="reserved for CI: currently identical to default")
    a = p.parse_args(argv)

    os.makedirs(f"{a.out}/logs", exist_ok=True)
    os.makedirs(f"{a.out}/FID", exist_ok=True)
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

    rows = []
    for name, cmd in _steps(a.out, a.chip, a.quick):
        log = f"{a.out}/logs/{name}.log"
        t0 = time.time()
        with open(log, "w") as fh:
            rc = subprocess.call(cmd, stdout=fh, stderr=subprocess.STDOUT,
                                 env=env)
        rows.append({"step": name, "rc": rc,
                     "seconds": round(time.time() - t0, 1), "log": log})
        print(f"{name:24s} rc={rc} {rows[-1]['seconds']:8.1f}s", flush=True)

    with open(f"{a.out}/repro_summary.json", "w") as fh:
        json.dump(rows, fh, indent=1)
    failed = sum(1 for r in rows if r["rc"] != 0)
    print(f"repro_all: {len(rows) - failed}/{len(rows)} steps ok "
          f"-> {a.out}/repro_summary.json")
    return failed


if __name__ == "__main__":
    raise SystemExit(main())
