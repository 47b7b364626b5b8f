#!/bin/bash
# r4 queue 8: the generative round trip on hardware — train NCSN++ (bf16)
# on the procedural gradient+ellipse distribution, snapshot every 4k
# steps, then walk every snapshot through 10-step NI sampling + FID.
# Plus one bf16 batch-512 bench_train scaling cell.
set -u
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
D=results/perf_r4
W=/tmp/roundtrip_work          # orbax snapshots are ~0.9 GB each: keep
T=/tmp/toy_cifar               # the heavy trees out of the repo

while ! grep -q "QUEUE7 DONE" $D/queue.log; do sleep 10; done

echo "=== toy dataset $(date +%H:%M:%S)" >> $D/queue.log
python -m naturaldiffusion_tpu.apps.toy_dataset --out $T \
  > $D/roundtrip_data.log 2>&1
echo "toy dataset rc=$?" >> $D/queue.log

echo "=== bench_train bf16 b512 $(date +%H:%M:%S)" >> $D/queue.log
timeout 900 python -m naturaldiffusion_tpu.apps.bench_train \
  --batch 512 --bf16 > $D/bench_train_bf16_b512.json \
  2> $D/bench_train_bf16_b512.err
echo "bench_train bf16 b512 rc=$?" >> $D/queue.log

echo "=== roundtrip train 20k $(date +%H:%M:%S)" >> $D/queue.log
timeout 5400 python -m naturaldiffusion_tpu.apps.train \
  --mode train --workdir $W --data-dir $T --dataset cifar10 \
  --bf16 --batch 256 --n-iters 20001 --warmup 1000 \
  --snapshot-freq 4000 --preemption-freq 2000 --log-freq 100 \
  --no-snapshot-samples > $D/roundtrip_train.log 2>&1
echo "roundtrip train rc=$?" >> $D/queue.log

echo "=== roundtrip eval $(date +%H:%M:%S)" >> $D/queue.log
timeout 3600 python -m naturaldiffusion_tpu.apps.roundtrip \
  --workdir $W --data-dir $T --num 4096 --batch 1024 --micro 64 \
  --out $D/roundtrip/roundtrip.csv --grid-dir $D/roundtrip/grids \
  > $D/roundtrip_eval.log 2>&1
echo "roundtrip eval rc=$?" >> $D/queue.log

# keep the small artifacts; snapshots stay in /tmp
mkdir -p $D/roundtrip
cp $W/metrics.jsonl $D/roundtrip/ 2>/dev/null
echo "QUEUE8 DONE $(date +%H:%M:%S)" >> $D/queue.log
