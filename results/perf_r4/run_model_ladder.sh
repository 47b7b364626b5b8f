#!/bin/bash
# In-model A/B ladder (VERDICT r3 task 1): headline bench under each
# conv-dispatch mode and the schedule-hoist control, strictly serial on
# the one chip. One JSON line per run -> bench_model_ladder.jsonl
set -u
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
OUT=results/perf_r4/bench_model_ladder.jsonl
: > "$OUT"

run () {
  label="$1"; shift
  echo "=== $label $(date +%H:%M:%S)" >&2
  line=$(timeout 1500 env "$@" python bench.py 2>>results/perf_r4/bench_model_ladder.err)
  rc=$?
  if [ $rc -eq 0 ] && [ -n "$line" ]; then
    echo "{\"run\": \"$label\", ${line#\{}" >> "$OUT"
  else
    echo "{\"run\": \"$label\", \"error\": $rc}" >> "$OUT"
  fi
}

run mods1_xla        BENCH_MODS=1 NATDIFF_PALLAS_CONV=0
run mods0_xla        BENCH_MODS=0 NATDIFF_PALLAS_CONV=0
run mods1_taps9      BENCH_MODS=1 NATDIFF_PALLAS_CONV=1 NATDIFF_CONV_VARIANT=taps9
run mods1_valid9     BENCH_MODS=1 NATDIFF_PALLAS_CONV=1 NATDIFF_CONV_VARIANT=valid9
run mods1_fused      BENCH_MODS=1 NATDIFF_PALLAS_CONV=2 NATDIFF_CONV_VARIANT=taps9
echo "DONE $(date +%H:%M:%S)" >&2
