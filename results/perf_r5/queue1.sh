#!/bin/bash
# r5 queue 1: verify drive, then the in-model W8A8 A/B (VERDICT r5 task 1).
set -u
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
D=results/perf_r5
echo "=== drive verify $(date +%H:%M:%S)" >> $D/queue.log
timeout 580 python /tmp/drive.py > $D/drive_verify.log 2>&1
echo "drive rc=$?" >> $D/queue.log
echo "=== bench int8 $(date +%H:%M:%S)" >> $D/queue.log
timeout 2400 env NATDIFF_QUANT=int8 python bench.py \
  > $D/bench_int8.json 2> $D/bench_int8.err
echo "bench int8 rc=$?" >> $D/queue.log
echo "=== bench control $(date +%H:%M:%S)" >> $D/queue.log
timeout 2400 python bench.py > $D/bench_control.json 2> $D/bench_control.err
echo "bench control rc=$?" >> $D/queue.log
echo "QUEUE1 DONE $(date +%H:%M:%S)" >> $D/queue.log
