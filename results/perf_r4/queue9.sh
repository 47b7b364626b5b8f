#!/bin/bash
# r4 queue 9: XLA compiler-flag ladder on the headline bench.  The r4 conv
# A/B settled that XLA's conv schedule beats our Pallas kernels in-model;
# the remaining lever on the ~780 img/s ceiling is XLA's own knobs.  Each
# cell pays a fresh compile (flags key the cache) — run back-to-back on an
# idle host, control first and a control repeat last to bracket drift.
set -u
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
D=results/perf_r4
OUT=$D/bench_xla_flags.jsonl

while ! grep -q "QUEUE8 DONE" $D/queue.log; do sleep 10; done

run_cell () {
  local tag="$1"; shift
  local flags="$1"; shift
  echo "=== bench flags:$tag $(date +%H:%M:%S)" >> $D/queue.log
  local line
  line=$(timeout 2400 env XLA_FLAGS="$flags" python bench.py 2> \
    $D/bench_flags_$tag.err | tail -1)
  echo "bench flags:$tag rc=$?" >> $D/queue.log
  [ -z "$line" ] && line=null
  echo "{\"cell\": \"$tag\", \"flags\": \"$flags\", \"result\": $line}" \
    >> $OUT
}

run_cell control ""
run_cell vmem112 "--xla_tpu_scoped_vmem_limit_kib=114688"
run_cell vmem128 "--xla_tpu_scoped_vmem_limit_kib=131072"
run_cell vmem64  "--xla_tpu_scoped_vmem_limit_kib=65536"
run_cell control2 ""

echo "QUEUE9 DONE $(date +%H:%M:%S)" >> $D/queue.log
