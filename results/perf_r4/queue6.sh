#!/bin/bash
# r4 queue 6: bench_train re-run with the corrected single-step FLOPs
# denominator (f32 + bf16), then regenerate the three sweep grids with the
# new wall_s column (compile cache is warm -> cells are seconds, not minutes).
set -u
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
D=results/perf_r4

while ! grep -q "QUEUE5 DONE" $D/queue.log; do sleep 10; done

for mode in f32 bf16; do
  FLAG=""; [ $mode = bf16 ] && FLAG="--bf16"
  echo "=== bench_train fixed $mode $(date +%H:%M:%S)" >> $D/queue.log
  timeout 1800 python -m naturaldiffusion_tpu.apps.bench_train \
    --batch 128 --chain 8 $FLAG \
    > $D/bench_train_${mode}_fixed.json 2> $D/bench_train_${mode}_fixed.err
  echo "bench_train $mode rc=$?" >> $D/queue.log
done

echo "=== bench_train fixed bf16 b256 $(date +%H:%M:%S)" >> $D/queue.log
timeout 1800 python -m naturaldiffusion_tpu.apps.bench_train \
  --batch 256 --chain 8 --bf16 \
  > $D/bench_train_bf16_b256_fixed.json 2> $D/bench_train_bf16_b256_fixed.err
echo "bench_train bf16 b256 rc=$?" >> $D/queue.log

for fam in deis dpmsolverpp dpmsolver; do
  DISC=""; [ $fam = deis ] && DISC="--discrete"
  echo "=== sweep2 $fam $(date +%H:%M:%S)" >> $D/queue.log
  timeout 3000 python -m naturaldiffusion_tpu.apps.sweep --family $fam \
    --num 5120 --batch 256 --micro 64 $DISC \
    > $D/sweep2_${fam}.log 2>&1
  echo "sweep2 $fam rc=$?" >> $D/queue.log
done

echo "QUEUE6 DONE $(date +%H:%M:%S)" >> $D/queue.log
