#!/bin/bash
# r4 queue 11: the compiler-options ladder, attempt 2.  The XLA_FLAGS route
# is closed (client-side CPU XLA aborts on TPU flags — see PERF.md), but a
# probe proved per-jit compiler_options reach the server-side TPU compiler
# (garbage names are rejected by tpu_compile_helper).  bench.py --warm-only
# prewarmed the vmem112 executable into the persistent cache during the
# roundtrip train, so the timed run here pays no tunnel compile.
set -u
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
D=results/perf_r4
OUT=$D/bench_xla_flags.jsonl

while ! grep -q "QUEUE10 DONE" $D/queue.log; do sleep 10; done

run_cell () {
  local tag="$1"; shift
  local opts="$1"; shift
  echo "=== bench copts:$tag $(date +%H:%M:%S)" >> $D/queue.log
  local line
  line=$(timeout 2400 env BENCH_COMPILER_OPTS="$opts" python bench.py 2> \
    $D/bench_copts_$tag.err | tail -1)
  echo "bench copts:$tag rc=$?" >> $D/queue.log
  [ -z "$line" ] && line=null
  echo "{\"cell\": \"$tag\", \"compiler_options\": $opts, \"result\": $line}" \
    >> $OUT
}

run_cell vmem112 '{"xla_tpu_scoped_vmem_limit_kib": "114688"}'
echo "QUEUE11 DONE $(date +%H:%M:%S)" >> $D/queue.log
