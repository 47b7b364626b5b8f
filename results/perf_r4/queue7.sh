#!/bin/bash
# r4 queue 7: clean re-run of the DEIS grid (queue6's first two cells ran
# while the CPU test suite was hogging the host, depressing rates ~9%).
set -u
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
D=results/perf_r4

while ! grep -q "QUEUE6 DONE" $D/queue.log; do sleep 10; done

echo "=== sweep3 deis clean $(date +%H:%M:%S)" >> $D/queue.log
timeout 3000 python -m naturaldiffusion_tpu.apps.sweep --family deis \
  --num 5120 --batch 256 --micro 64 --discrete \
  > $D/sweep3_deis.log 2>&1
echo "sweep3 deis rc=$?" >> $D/queue.log
echo "QUEUE7 DONE $(date +%H:%M:%S)" >> $D/queue.log
