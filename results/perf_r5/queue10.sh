#!/bin/bash
# r5 queue10: reprioritized remainder after int8_static's 1034.5 img/s cell.
# The trained-EMA static accuracy gate (decides the headline default flip)
# moves ahead of the low-priority sweep grids; the cut-off queue_resume cells
# are all re-queued here in value order.
set -u
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
D=results/perf_r5

echo "=== QUEUE10 start $(date +%H:%M:%S)" >> $D/queue.log

# let the orphaned bench_int8_mods cell finish first
while kill -0 22151 2>/dev/null; do sleep 10; done
echo "=== orphan drained $(date +%H:%M:%S)" >> $D/queue.log

run () {
  local tag="$1"; local to="$2"; shift 2
  echo "=== $tag $(date +%H:%M:%S)" >> $D/queue.log
  timeout "$to" "$@" > $D/$tag.json 2> $D/$tag.err
  echo "$tag rc=$?" >> $D/queue.log
}
runlog () {
  local tag="$1"; local to="$2"; shift 2
  echo "=== $tag $(date +%H:%M:%S)" >> $D/queue.log
  timeout "$to" "$@" > $D/$tag.log 2>&1
  echo "$tag rc=$?" >> $D/queue.log
}

B=python
# 1) dynamic-int8 bracket (reproducibility vs 811.6)
run bench_int8_ctl2 2400 env BENCH_QUANT=int8 $B bench.py
# 2) toy retrain (trained-EMA weights for the accuracy gates; /tmp wiped)
runlog toy_dataset2 600 $B -m naturaldiffusion_tpu.apps.toy_dataset --out /tmp/toy_cifar
runlog train5k2 2400 $B -m naturaldiffusion_tpu.apps.train \
  --mode train --workdir /tmp/roundtrip_work --data-dir /tmp/toy_cifar --dataset cifar10 \
  --bf16 --batch 256 --n-iters 5001 --warmup 1000 \
  --snapshot-freq 2500 --preemption-freq 2000 --log-freq 100 \
  --no-snapshot-samples
# 3) THE GATE: trained-EMA accuracy of the static modes
run quant_acc_static_trained 2400 $B -m naturaldiffusion_tpu.apps.quant_accuracy \
  --mode int8_static --workdir /tmp/roundtrip_work --out $D/quant_accuracy_static_trained.json
run quant_acc_allstatic_trained 2400 $B -m naturaldiffusion_tpu.apps.quant_accuracy \
  --mode int8_all_static --workdir /tmp/roundtrip_work --out $D/quant_accuracy_allstatic_trained.json
# 4) static-mode perf ladder + bracket
run bench_int8_all_static 2400 env BENCH_QUANT=int8_all_static $B bench.py
run bench_int8_static_b  2400 env BENCH_QUANT=int8_static $B bench.py
run bench_int8_static_m128 2400 env BENCH_QUANT=int8_static BENCH_MICRO=128 $B bench.py
# 5) where the static win comes from (xprof)
echo "=== trace int8_static $(date +%H:%M:%S)" >> $D/queue.log
timeout 2400 env BENCH_QUANT=int8_static $B bench.py --trace $D/trace_int8_static \
  > $D/bench_int8_static_trace.json 2> $D/bench_int8_static_trace.err
echo "trace static rc=$?" >> $D/queue.log
timeout 600 $B -m naturaldiffusion_tpu.utils.trace_summary $D/trace_int8_static \
  > $D/trace_int8_static_summary.txt 2>&1
# 6) controllable EM retry (VERDICT #5 follow-up) with the fresh weights
runlog controllable_em 2400 $B -m naturaldiffusion_tpu.apps.controllable_eval \
  --workdir /tmp/roundtrip_work --outdir $D/controllable_em \
  --predictor euler_maruyama --corrector none --num 16 --seeds 2
# 7) verify drive retry (fixed assertions)
run drive_verify3 1200 $B results/perf_r5/drive.py
# 8) SD3-1024 MFU (the r4 claim's denominator)
run bench_sd3_1024_mfu 3600 $B -m naturaldiffusion_tpu.apps.bench_sd3 --latent 128 --steps 28
# 9) per-op quant evidence
run quant_ops 3600 $B -m naturaldiffusion_tpu.apps.bench_quant_ops --reps 30 --runs 7
# 10) 50k grid-scale cell
runlog sweep_50k_cell 3000 $B -m naturaldiffusion_tpu.apps.sweep \
  --family deis --steps 10 --num 50000 --batch 1024 --micro 64 --discrete \
  --only t:t_ab:3 --out results/FID/deis_10step_50k_cell.csv
# 11) remaining sweep grids
for fam_st in deis:15 dpmsolver:5 dpmsolver:15 dpmsolverpp:15; do
  fam=${fam_st%%:*}; st=${fam_st##*:}
  runlog sweep_${fam}_${st} 3000 $B -m naturaldiffusion_tpu.apps.sweep \
    --family $fam --steps $st --num 5120 --batch 256 --micro 64 --discrete \
    --out results/FID/${fam}_${st}step_sweep.csv
done
# 12) final default bench (measures whatever bench.py's default is by then)
run bench_final_default 2400 $B bench.py
echo "QUEUE10 DONE $(date +%H:%M:%S)" >> $D/queue.log
