#!/bin/bash
# r5 queue 8 (chains on QUEUE7 DONE): SD3 weight-only-int8 A/B at 512px
# (the 2B-param step reads ~4GB of bf16 weights per CFG forward — ~30% of
# its time; w8 halves that) + int8_static accuracy on trained weights.
set -u
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
D=results/perf_r5

while ! grep -q "QUEUE7 DONE" $D/queue.log; do sleep 30; done

run () {
  local tag="$1"; shift
  echo "=== $tag $(date +%H:%M:%S)" >> $D/queue.log
  "$@" > $D/$tag.json 2> $D/$tag.err
  echo "$tag rc=$?" >> $D/queue.log
}

run bench_sd3_w8 env NATDIFF_QUANT=w8 timeout 3000 python -m naturaldiffusion_tpu.apps.bench_sd3 --latent 64 --steps 28
run quant_acc_static_trained timeout 2400 python -m naturaldiffusion_tpu.apps.quant_accuracy \
  --mode int8_static --workdir /tmp/roundtrip_work --batch 64 \
  --out $D/quant_accuracy_static_trained.json
echo "QUEUE8 DONE $(date +%H:%M:%S)" >> $D/queue.log
