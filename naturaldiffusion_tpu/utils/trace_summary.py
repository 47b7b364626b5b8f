"""Summarize an xprof trace into an op-category table (the auditable half
of PERF.md's profiler claims).

``jax.profiler`` writes ``plugins/profile/<ts>/*.trace.json.gz`` next to the
xplane proto; the JSON trace needs no tensorflow to parse, so this works in
the slim TPU image.  Events on the device tracks carry XLA op names like
``fusion.123``, ``convolution.45.remat``, ``copy-done.7`` — we fold them
into families (strip trailing ``.N``/digits), sum durations, and report each
family's share of device time.

With ``--bytes N`` (logical bytes moved by ONE instance of the op of
interest, e.g. a GN stats pass reading a bf16 activation) the table also
prints achieved GB/s per family so bandwidth-boundedness is checkable
against the chip's HBM peak (v5e: 819 GB/s).

Usage::

    python -m naturaldiffusion_tpu.utils.trace_summary /tmp/prof
    python -m naturaldiffusion_tpu.utils.trace_summary /tmp/prof \
        --family convert_reduce_fusion --bytes 1572864 --count 160
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re


def _find_trace(logdir: str) -> str:
    pats = sorted(glob.glob(os.path.join(
        logdir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not pats:
        raise FileNotFoundError(f"no *.trace.json.gz under {logdir}")
    return pats[-1]


def _family(name: str) -> str:
    # fusion.123 -> fusion; convolution.4.remat2 -> convolution;
    # %copy-done.7 -> copy-done; wide_convert_reduce_fusion.3 -> same
    name = name.split("/")[-1].lstrip("%")
    name = re.sub(r"\.\d+", "", name)
    name = re.sub(r"\.remat\d*", "", name)
    return name


def summarize(logdir: str):
    """-> (total_device_us, {family: us}) summed over device-track events."""
    with gzip.open(_find_trace(logdir), "rt") as f:
        tr = json.load(f)
    events = tr.get("traceEvents", [])
    # device tracks: process names like "/device:TPU:0" or "TPU:0"; host
    # python/runtime tracks are excluded so RPC idle time doesn't pollute
    dev_pids = {e["pid"] for e in events
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    # keep only the leaf-op track ("XLA Ops"): device pids also carry
    # "Steps" / "XLA Modules" tracks whose events duplicate (or are not)
    # ops and would double-count into the family totals
    op_tids = {(e["pid"], e["tid"]) for e in events
               if e.get("ph") == "M" and e.get("name") == "thread_name"
               and e.get("pid") in dev_pids
               and "XLA Ops" in str(e.get("args", {}).get("name", ""))}
    fam = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids and "dur" in e:
            if op_tids and (e["pid"], e.get("tid")) not in op_tids:
                continue
            # fallback (no thread_name metadata): drop module/step events
            if e.get("name", "").startswith(("jit_", "pmap_")):
                continue
            if str(e.get("name", "")).isdigit():      # Steps-track markers
                continue
            fam[_family(e["name"])] += e["dur"]
    # control-flow containers (while/conditional/call) span their children,
    # which are ALSO emitted as leaf events — counting both double-counts
    # the loop body (seen in the r5 int8 trace: "while" at 50%).  Report
    # leaves only; the container share is recoverable as total-vs-wall.
    for k in ("while", "conditional", "call"):
        fam.pop(k, None)
    return sum(fam.values()), dict(fam)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir")
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--family", help="print achieved GB/s for this family")
    ap.add_argument("--bytes", type=float, default=0.0,
                    help="logical bytes moved per op instance of --family")
    ap.add_argument("--count", type=int, default=1,
                    help="number of --family instances in the trace window")
    args = ap.parse_args()

    total, fam = summarize(args.logdir)
    print(f"device total: {total / 1e3:.3f} ms")
    for name, us in sorted(fam.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"{us / 1e3:10.3f} ms  {us / total * 100:5.1f}%  {name}")
    if args.family:
        us = fam.get(args.family, 0)
        if us and args.bytes:
            gbps = args.bytes * args.count / (us * 1e-6) / 1e9
            print(f"\n{args.family}: {us / 1e3:.3f} ms for {args.count} x "
                  f"{args.bytes / 1e6:.2f} MB -> {gbps:.0f} GB/s achieved")
        else:
            print(f"\n{args.family}: {us / 1e3:.3f} ms in trace")


if __name__ == "__main__":
    main()
