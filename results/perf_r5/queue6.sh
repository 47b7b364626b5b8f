#!/bin/bash
# r5 queue 6 (chains on QUEUE5 DONE): verify-drive retry (marginal assert
# fixed to the family-correct tolerance model), SD3-1024 MFU (the r4
# "VPU softmax speed-of-light" claim gets its denominator), final brackets.
set -u
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
D=results/perf_r5

while ! grep -q "QUEUE5 DONE" $D/queue.log; do sleep 30; done

run () {
  local tag="$1"; shift
  echo "=== $tag $(date +%H:%M:%S)" >> $D/queue.log
  "$@" > $D/$tag.json 2> $D/$tag.err
  echo "$tag rc=$?" >> $D/queue.log
}

run drive_verify3 timeout 1200 python results/perf_r5/drive.py
run bench_sd3_1024_mfu timeout 3600 python -m naturaldiffusion_tpu.apps.bench_sd3 --latent 128 --steps 28
run bench_final_default timeout 2400 python bench.py
echo "QUEUE6 DONE $(date +%H:%M:%S)" >> $D/queue.log
