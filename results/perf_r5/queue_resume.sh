#!/bin/bash
# r5 RESUME queue: the previous session ended mid-queue_final (after the
# three learned_ni cells; train_b512_ctl was cut off with an empty JSON).
# Re-runs every remaining cell in the same VERDICT-priority order.
set -u
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
D=results/perf_r5

echo "=== RESUME QUEUE start $(date +%H:%M:%S)" >> $D/queue.log

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
# 1) training ladder (VERDICT #3)
run train_b512_ctl   2400 $B -m naturaldiffusion_tpu.apps.bench_train --batch 512 --bf16
run train_b512_m64   2400 $B -m naturaldiffusion_tpu.apps.bench_train --batch 512 --bf16 --micro 64
run train_b512_m128  2400 $B -m naturaldiffusion_tpu.apps.bench_train --batch 512 --bf16 --micro 128
run train_b512_remat 2400 $B -m naturaldiffusion_tpu.apps.bench_train --batch 512 --bf16 --remat
run train_b1024_m128 2400 $B -m naturaldiffusion_tpu.apps.bench_train --batch 1024 --bf16 --micro 128
echo "=== train trace $(date +%H:%M:%S)" >> $D/queue.log
timeout 2400 $B -m naturaldiffusion_tpu.apps.bench_train --batch 512 --bf16 \
  --trace $D/trace_train_b512 > $D/train_b512_trace.json 2> $D/train_b512_trace.err
echo "train trace rc=$?" >> $D/queue.log
timeout 600 $B -m naturaldiffusion_tpu.utils.trace_summary $D/trace_train_b512 \
  > $D/trace_train_b512_summary.txt 2>&1
# 2) DiT/SD3 MFU (VERDICT #7) + w8 A/B
run bench_dit_mfu 2400 $B -m naturaldiffusion_tpu.apps.bench_dit --steps 50 --batch 1
run bench_dit_w8  2400 env NATDIFF_QUANT=w8 $B -m naturaldiffusion_tpu.apps.bench_dit --steps 50 --batch 1
run bench_sd3_mfu 3000 $B -m naturaldiffusion_tpu.apps.bench_sd3 --latent 64 --steps 28
run bench_sd3_w8  3000 env NATDIFF_QUANT=w8 $B -m naturaldiffusion_tpu.apps.bench_sd3 --latent 64 --steps 28
# 3) int8 refinement ladder + brackets
run bench_int8_static 2400 env BENCH_QUANT=int8_static $B bench.py
run quant_acc_static  2400 $B -m naturaldiffusion_tpu.apps.quant_accuracy --mode int8_static --out $D/quant_accuracy_static.json
run bench_int8_mods   2400 env BENCH_QUANT=int8 BENCH_MODS=1 $B bench.py
run bench_int8_ctl2   2400 env BENCH_QUANT=int8 $B bench.py
# 4) verify drive retry
run drive_verify3 1200 $B results/perf_r5/drive.py
# 5) per-op quant evidence + 50k cell
run quant_ops 3600 $B -m naturaldiffusion_tpu.apps.bench_quant_ops --reps 30 --runs 7
runlog sweep_50k_cell 3000 $B -m naturaldiffusion_tpu.apps.sweep \
  --family deis --steps 10 --num 50000 --batch 1024 --micro 64 --discrete \
  --only t:t_ab:3 --out results/FID/deis_10step_50k_cell.csv
# 5b) controllable EM retry — /tmp was wiped by the VM restart, so retrain
# the toy model first (same recipe as queue3).
runlog toy_dataset2 600 $B -m naturaldiffusion_tpu.apps.toy_dataset --out /tmp/toy_cifar
runlog train5k2 2400 $B -m naturaldiffusion_tpu.apps.train \
  --mode train --workdir /tmp/roundtrip_work --data-dir /tmp/toy_cifar --dataset cifar10 \
  --bf16 --batch 256 --n-iters 5001 --warmup 1000 \
  --snapshot-freq 2500 --preemption-freq 2000 --log-freq 100 \
  --no-snapshot-samples
runlog controllable_em 2400 $B -m naturaldiffusion_tpu.apps.controllable_eval \
  --workdir /tmp/roundtrip_work --outdir $D/controllable_em \
  --predictor euler_maruyama --corrector none --num 16 --seeds 2
# 6) SD3-1024 MFU (the r4 claim's denominator)
run bench_sd3_1024_mfu 3600 $B -m naturaldiffusion_tpu.apps.bench_sd3 --latent 128 --steps 28
# 7) remaining sweep grids (lowest priority; each self-contained)
for fam_st in deis:15 dpmsolver:5 dpmsolver:15 dpmsolverpp:15; do
  fam=${fam_st%%:*}; st=${fam_st##*:}
  runlog sweep_${fam}_${st} 3000 $B -m naturaldiffusion_tpu.apps.sweep \
    --family $fam --steps $st --num 5120 --batch 256 --micro 64 --discrete \
    --out results/FID/${fam}_${st}step_sweep.csv
done
# 8) final default-bench bracket
run bench_final_default 2400 $B bench.py
echo "RESUME QUEUE DONE $(date +%H:%M:%S)" >> $D/queue.log
