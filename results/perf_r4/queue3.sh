#!/bin/bash
set -u
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
D=results/perf_r4

# serialize behind queue2
while ! grep -q "QUEUE2 DONE" $D/queue.log; do sleep 20; done

echo "=== drive(verify) $(date +%H:%M:%S)" >> $D/queue.log
timeout 580 python $D/drive_r4.py > $D/drive2.log 2>&1
echo "drive rc=$?" >> $D/queue.log

echo "=== mods1_fused rerun $(date +%H:%M:%S)" >> $D/queue.log
line=$(timeout 1500 env BENCH_MODS=1 NATDIFF_PALLAS_CONV=2 NATDIFF_CONV_VARIANT=taps9 python bench.py 2>>$D/bench_model_ladder.err)
rc=$?
if [ $rc -eq 0 ] && [ -n "$line" ]; then
  echo "{\"run\": \"mods1_fused_v2\", ${line#\{}" >> $D/bench_model_ladder.jsonl
else
  echo "{\"run\": \"mods1_fused_v2\", \"error\": $rc}" >> $D/bench_model_ladder.jsonl
fi

echo "=== bench_train $(date +%H:%M:%S)" >> $D/queue.log
timeout 1800 python -m naturaldiffusion_tpu.apps.bench_train --batch 128 --chain 8 > $D/bench_train.json 2> $D/bench_train.err
echo "bench_train rc=$?" >> $D/queue.log

echo "=== train_overlap $(date +%H:%M:%S)" >> $D/queue.log
timeout 1800 python $D/train_overlap.py > $D/train_overlap.json 2> $D/train_overlap.err
echo "train_overlap rc=$?" >> $D/queue.log

echo "=== train500 $(date +%H:%M:%S)" >> $D/queue.log
timeout 1800 python -m naturaldiffusion_tpu.apps.train --workdir $D/train500 \
  --data-dir /tmp/cifar_synth --n-iters 501 --log-freq 25 \
  --no-snapshot-samples > $D/train500.log 2>&1
echo "train500 rc=$?" >> $D/queue.log
echo "QUEUE3 DONE $(date +%H:%M:%S)" >> $D/queue.log
