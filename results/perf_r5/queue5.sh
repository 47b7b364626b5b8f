#!/bin/bash
# r5 queue 5 (chains on QUEUE4 DONE): int8 refinement ladder — static
# activation scales (deletes the dynamic amax pass), schedule-hoist
# revisited under int8 (the non-conv fraction grew), bracket control.
set -u
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
D=results/perf_r5

while ! grep -q "QUEUE4 DONE" $D/queue.log; do sleep 30; done

run () {
  local tag="$1"; shift
  echo "=== $tag $(date +%H:%M:%S)" >> $D/queue.log
  "$@" > $D/$tag.json 2> $D/$tag.err
  echo "$tag rc=$?" >> $D/queue.log
}

run bench_int8_static env BENCH_QUANT=int8_static timeout 2400 python bench.py
run quant_acc_static timeout 2400 python -m naturaldiffusion_tpu.apps.quant_accuracy \
  --mode int8_static --out $D/quant_accuracy_static.json
run bench_int8_mods env BENCH_QUANT=int8 BENCH_MODS=1 timeout 2400 python bench.py
run bench_int8_ctl2 env BENCH_QUANT=int8 timeout 2400 python bench.py
echo "QUEUE5 DONE $(date +%H:%M:%S)" >> $D/queue.log
