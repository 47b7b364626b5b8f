"""Auditable-MFU helpers (VERDICT r4 weak #5 / next #7).

``bench.py`` pioneered the pattern: report the XLA-cost-analysis FLOP count
next to every throughput number so MFU is auditable, and source it WITHOUT
paying a tunnel compile — client-side on the lowering when the backend
supports it, else a CPU-platform subprocess re-invoking the same app with
``--flops-only``.  This module extracts that pattern for the DiT/SD3 benches.
"""

from __future__ import annotations

import subprocess
import sys

import jax

# v5e bf16 MXU peak (the production inference dtype on this hardware)
V5E_BF16_PEAK = 197e12


def flops_from_lowered(lowered) -> float | None:
    """FLOPs from a ``jax.jit(...).lower(...)`` result, or None when the
    backend can't cost-analyze client-side (the axon tunnel plugin)."""
    try:
        ca = lowered.cost_analysis()
    except Exception:
        ca = None
    if not ca and jax.default_backend() == "cpu":
        ca = lowered.compile().cost_analysis()
    if ca:
        ca = ca[0] if isinstance(ca, list) else ca
        f = float(ca.get("flops", 0.0))
        if f > 0:
            return f
    return None


def flops_via_cpu_subprocess(module: str, argv: list[str]) -> float:
    """Re-run ``python -m <module> --flops-only <argv>`` on the CPU platform
    and parse the one float it prints.  The child must force
    ``jax.config.update('jax_platforms', 'cpu')`` before first device use
    (the image's sitecustomize pins the axon platform otherwise).

    Quant flags are STRIPPED from the child env: the FLOP denominator is
    the same math either way, and the quantized paths dispatch to Pallas
    kernels whose CPU cost analysis is meaningless (or unavailable)."""
    import os
    env = {k: v for k, v in os.environ.items() if k != "NATDIFF_QUANT"}
    out = subprocess.run(
        [sys.executable, "-m", module, "--flops-only", *argv],
        capture_output=True, text=True, check=True, env=env)
    return float(out.stdout.strip().splitlines()[-1])
