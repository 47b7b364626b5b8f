#!/bin/bash
# r5 queue 7 (chains on QUEUE6 DONE): DiT weight-only-int8 A/B (the
# weight-read-bound lever the W8A8 conv lesson doesn't cover) + the chip
# retry of quant_accuracy in scan form.
set -u
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
D=results/perf_r5

while ! grep -q "QUEUE6 DONE" $D/queue.log; do sleep 30; done

run () {
  local tag="$1"; shift
  echo "=== $tag $(date +%H:%M:%S)" >> $D/queue.log
  "$@" > $D/$tag.json 2> $D/$tag.err
  echo "$tag rc=$?" >> $D/queue.log
}

run bench_dit_w8 env NATDIFF_QUANT=w8 timeout 2400 python -m naturaldiffusion_tpu.apps.bench_dit --steps 50 --batch 1
run quant_acc_chip timeout 2400 python -m naturaldiffusion_tpu.apps.quant_accuracy --out $D/quant_accuracy.json
echo "QUEUE7 DONE $(date +%H:%M:%S)" >> $D/queue.log
