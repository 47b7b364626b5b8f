#!/bin/bash
set -u
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
D=results/perf_r4

while ! grep -q "QUEUE3 DONE" $D/queue.log; do sleep 20; done

echo "=== sweep deis $(date +%H:%M:%S)" >> $D/queue.log
timeout 3000 python -m naturaldiffusion_tpu.apps.sweep --family deis \
  --num 5120 --batch 256 --micro 64 --discrete \
  > $D/sweep_deis.log 2>&1
echo "sweep deis rc=$?" >> $D/queue.log

echo "=== sweep dpmsolverpp $(date +%H:%M:%S)" >> $D/queue.log
timeout 2400 python -m naturaldiffusion_tpu.apps.sweep --family dpmsolverpp \
  --num 5120 --batch 256 --micro 64 \
  > $D/sweep_dpmsolverpp.log 2>&1
echo "sweep dpmsolverpp rc=$?" >> $D/queue.log

echo "=== sweep dpmsolver $(date +%H:%M:%S)" >> $D/queue.log
timeout 2400 python -m naturaldiffusion_tpu.apps.sweep --family dpmsolver \
  --num 5120 --batch 256 --micro 64 \
  > $D/sweep_dpmsolver.log 2>&1
echo "sweep dpmsolver rc=$?" >> $D/queue.log
echo "QUEUE4 DONE $(date +%H:%M:%S)" >> $D/queue.log
