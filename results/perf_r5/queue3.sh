#!/bin/bash
# r5 queue 3 (chains on QUEUE2 DONE): the hardware-coverage tail —
# toy retrain (r4's /tmp workdir was wiped), BPD + inpaint/colorize on chip
# with trained EMA weights (VERDICT r5 task 5), trained-weights quant
# accuracy (task 1 accuracy budget), the 5/15-step sweep grids + learned
# matrix NI cells + one 50k cell (task 4), and the training-step ladder
# (task 3).
set -u
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
D=results/perf_r5
W=/tmp/roundtrip_work
T=/tmp/toy_cifar

while ! grep -q "QUEUE2 DONE" $D/queue.log; do sleep 20; done

run () {
  local tag="$1"; shift
  echo "=== $tag $(date +%H:%M:%S)" >> $D/queue.log
  "$@" > $D/$tag.log 2>&1
  echo "$tag rc=$?" >> $D/queue.log
}

run toy_dataset python -m naturaldiffusion_tpu.apps.toy_dataset --out $T
run train5k timeout 2400 python -m naturaldiffusion_tpu.apps.train \
  --mode train --workdir $W --data-dir $T --dataset cifar10 \
  --bf16 --batch 256 --n-iters 5001 --warmup 1000 \
  --snapshot-freq 2500 --preemption-freq 2000 --log-freq 100 \
  --no-snapshot-samples
run bpd_eval timeout 2400 python -m naturaldiffusion_tpu.apps.train \
  --mode eval --bpd --workdir $W --data-dir $T --dataset cifar10 --batch 64
run controllable timeout 2400 python -m naturaldiffusion_tpu.apps.controllable_eval \
  --workdir $W --outdir $D/controllable --num 16 --seeds 2
run quant_acc_trained timeout 2400 python -m naturaldiffusion_tpu.apps.quant_accuracy \
  --workdir $W --batch 64 --out $D/quant_accuracy_trained.json

for st in 5 15; do
  for fam in deis dpmsolverpp dpmsolver; do
    run sweep_${fam}_${st} timeout 3000 python -m naturaldiffusion_tpu.apps.sweep \
      --family $fam --steps $st --num 5120 --batch 256 --micro 64 --discrete \
      --out results/FID/${fam}_${st}step_sweep.csv
  done
done

for st in 5 10 15; do
  wfile=$(ls /root/reference/weights/step_${st}_weight_*.npz | head -1)
  run learned_ni_${st} timeout 2400 python -m naturaldiffusion_tpu.apps.cifar10_ni \
    --weights $wfile --steps $st --num 5120 --batch 1024 --micro 64 \
    --outdir $D/learned_ni_${st}
done

# one 50k-scale sweep cell to pin grid-scale cost (VERDICT missing #1 tail)
run sweep_50k_cell timeout 3000 python -m naturaldiffusion_tpu.apps.sweep \
  --family deis --steps 10 --num 50000 --batch 1024 --micro 64 --discrete \
  --only t:t_ab:3 --out results/FID/deis_10step_50k_cell.csv

echo "QUEUE3 DONE $(date +%H:%M:%S)" >> $D/queue.log
