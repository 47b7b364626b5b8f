#!/bin/bash
# r5 queue 2: int8 coverage widened to NIN/1x1 (bench_int8_wide), micro-batch
# retune under int8's halved VMEM working set, on-chip accuracy budget,
# re-run of the fixed verify drive, and the r4-unfinished vmem128 copts cell.
set -u
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
D=results/perf_r5

run () {
  local tag="$1"; shift
  echo "=== $tag $(date +%H:%M:%S)" >> $D/queue.log
  "$@" > $D/$tag.json 2> $D/$tag.err
  echo "$tag rc=$?" >> $D/queue.log
}

run bench_int8_wide  env NATDIFF_QUANT=int8 timeout 2400 python bench.py
run bench_int8_m128  env NATDIFF_QUANT=int8 BENCH_MICRO=128 timeout 2400 python bench.py
run bench_bf16_m128  env BENCH_MICRO=128 timeout 2400 python bench.py
run quant_accuracy   timeout 2400 python -m naturaldiffusion_tpu.apps.quant_accuracy --out $D/quant_accuracy.json
run drive_verify2    timeout 580 python /tmp/drive.py
run bench_copts_vmem128 env BENCH_COMPILER_OPTS='{"xla_tpu_scoped_vmem_limit_kib": "131072"}' timeout 2400 python bench.py
echo "=== trace int8 $(date +%H:%M:%S)" >> $D/queue.log
env NATDIFF_QUANT=int8 timeout 1200 python bench.py --trace $D/trace_int8 > $D/bench_int8_trace.json 2> $D/bench_int8_trace.err
echo "trace rc=$?" >> $D/queue.log
timeout 600 python -m naturaldiffusion_tpu.utils.trace_summary $D/trace_int8 > $D/trace_int8_summary.txt 2>&1
echo "QUEUE2 DONE $(date +%H:%M:%S)" >> $D/queue.log
