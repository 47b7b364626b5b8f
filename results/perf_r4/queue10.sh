#!/bin/bash
# r4 queue 10: restart of the work the 20:44 host reboot killed.
#   (a) queue9's XLA scoped-VMEM flag ladder on the headline bench
#       (cold cache after reboot — control first, control repeat last);
#   (b) queue8's generative roundtrip, rightsized to the session budget:
#       regenerate the procedural dataset (/tmp was wiped), train 10k
#       steps bf16 snapshotting every 2.5k, then FID-walk every snapshot.
set -u
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
D=results/perf_r4
W=/tmp/roundtrip_work
T=/tmp/toy_cifar
OUT=$D/bench_xla_flags.jsonl

run_cell () {
  local tag="$1"; shift
  local flags="$1"; shift
  echo "=== bench flags:$tag $(date +%H:%M:%S)" >> $D/queue.log
  local line
  line=$(timeout 2400 env XLA_FLAGS="$flags" python bench.py 2> \
    $D/bench_flags_$tag.err | tail -1)
  echo "bench flags:$tag rc=$?" >> $D/queue.log
  [ -z "$line" ] && line=null
  echo "{\"cell\": \"$tag\", \"flags\": \"$flags\", \"result\": $line}" \
    >> $OUT
}

run_cell control ""
run_cell vmem112 "--xla_tpu_scoped_vmem_limit_kib=114688"
run_cell vmem128 "--xla_tpu_scoped_vmem_limit_kib=131072"
run_cell vmem64  "--xla_tpu_scoped_vmem_limit_kib=65536"
run_cell control2 ""
echo "QUEUE10 LADDER DONE $(date +%H:%M:%S)" >> $D/queue.log

echo "=== toy dataset $(date +%H:%M:%S)" >> $D/queue.log
python -m naturaldiffusion_tpu.apps.toy_dataset --out $T \
  > $D/roundtrip_data.log 2>&1
echo "toy dataset rc=$?" >> $D/queue.log

echo "=== roundtrip train 10k $(date +%H:%M:%S)" >> $D/queue.log
timeout 3000 python -m naturaldiffusion_tpu.apps.train \
  --mode train --workdir $W --data-dir $T --dataset cifar10 \
  --bf16 --batch 256 --n-iters 10001 --warmup 1000 \
  --snapshot-freq 2500 --preemption-freq 2000 --log-freq 100 \
  --no-snapshot-samples > $D/roundtrip_train.log 2>&1
echo "roundtrip train rc=$?" >> $D/queue.log

echo "=== roundtrip eval $(date +%H:%M:%S)" >> $D/queue.log
timeout 2400 python -m naturaldiffusion_tpu.apps.roundtrip \
  --workdir $W --data-dir $T --num 4096 --batch 1024 --micro 64 \
  --out $D/roundtrip/roundtrip.csv --grid-dir $D/roundtrip/grids \
  > $D/roundtrip_eval.log 2>&1
echo "roundtrip eval rc=$?" >> $D/queue.log

mkdir -p $D/roundtrip
cp $W/metrics.jsonl $D/roundtrip/ 2>/dev/null
echo "QUEUE10 DONE $(date +%H:%M:%S)" >> $D/queue.log
