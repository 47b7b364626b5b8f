#!/bin/bash
set -u
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
D=results/perf_r4

echo "=== mods1_fused $(date +%H:%M:%S)" >> $D/queue.log
line=$(timeout 1500 env BENCH_MODS=1 NATDIFF_PALLAS_CONV=2 NATDIFF_CONV_VARIANT=taps9 python bench.py 2>>$D/bench_model_ladder.err)
rc=$?
if [ $rc -eq 0 ] && [ -n "$line" ]; then
  echo "{\"run\": \"mods1_fused\", ${line#\{}" >> $D/bench_model_ladder.jsonl
else
  echo "{\"run\": \"mods1_fused\", \"error\": $rc}" >> $D/bench_model_ladder.jsonl
fi

echo "=== ring500 $(date +%H:%M:%S)" >> $D/queue.log
timeout 1200 python $D/ring500.py > $D/ring500.json 2> $D/ring500.err
echo "ring500 rc=$?" >> $D/queue.log

echo "=== fir_bench $(date +%H:%M:%S)" >> $D/queue.log
timeout 1500 python $D/fir_bench.py > $D/fir_bench.json 2> $D/fir_bench.err
echo "fir_bench rc=$?" >> $D/queue.log
echo "QUEUE2 DONE $(date +%H:%M:%S)" >> $D/queue.log
