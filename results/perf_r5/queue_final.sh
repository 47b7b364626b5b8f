#!/bin/bash
# r5 FINAL queue: consolidation of queues 3(tail)-9 in VERDICT-priority
# order after the tunnel compile path degraded mid-round (trivial compiles
# stalling >2 min).  Waits for the orphaned in-flight dpmsolverpp-5 sweep
# cell (pid captured at write time), then runs cells most-valuable-first so
# a slow tail starves sweeps, not the training ladder.
set -u
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
D=results/perf_r5

while [ -d /proc/23785 ]; do sleep 20; done
echo "=== FINAL QUEUE start $(date +%H:%M:%S)" >> $D/queue.log

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
# 1) learned-matrix NI cells (VERDICT #4's headline artifact)
for st in 5 10 15; do
  wfile=$(ls /root/reference/weights/step_${st}_weight_*.npz | head -1)
  runlog learned_ni_${st} 2400 $B -m naturaldiffusion_tpu.apps.cifar10_ni \
    --weights $wfile --steps $st --num 5120 --batch 1024 --micro 64 \
    --outdir $D/learned_ni_${st}
done
# 2) training ladder (VERDICT #3)
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
# 3) DiT/SD3 MFU (VERDICT #7) + DiT w8 A/B
run bench_dit_mfu 2400 $B -m naturaldiffusion_tpu.apps.bench_dit --steps 50 --batch 1
run bench_dit_w8  2400 env NATDIFF_QUANT=w8 $B -m naturaldiffusion_tpu.apps.bench_dit --steps 50 --batch 1
run bench_sd3_mfu 3000 $B -m naturaldiffusion_tpu.apps.bench_sd3 --latent 64 --steps 28
run bench_sd3_w8  3000 env NATDIFF_QUANT=w8 $B -m naturaldiffusion_tpu.apps.bench_sd3 --latent 64 --steps 28
# 4) int8 refinement ladder + brackets
run bench_int8_static 2400 env BENCH_QUANT=int8_static $B bench.py
run quant_acc_static  2400 $B -m naturaldiffusion_tpu.apps.quant_accuracy --mode int8_static --out $D/quant_accuracy_static.json
run bench_int8_mods   2400 env BENCH_QUANT=int8 BENCH_MODS=1 $B bench.py
run bench_int8_ctl2   2400 env BENCH_QUANT=int8 $B bench.py
# 5) verify drive retry + controllable EM retry
run drive_verify3 1200 $B results/perf_r5/drive.py
runlog controllable_em 2400 $B -m naturaldiffusion_tpu.apps.controllable_eval \
  --workdir /tmp/roundtrip_work --outdir $D/controllable_em \
  --predictor euler_maruyama --corrector none --num 16 --seeds 2
# 6) per-op quant evidence + 50k cell
run quant_ops 3600 $B -m naturaldiffusion_tpu.apps.bench_quant_ops --reps 30 --runs 7
runlog sweep_50k_cell 3000 $B -m naturaldiffusion_tpu.apps.sweep \
  --family deis --steps 10 --num 50000 --batch 1024 --micro 64 --discrete \
  --only t:t_ab:3 --out results/FID/deis_10step_50k_cell.csv
# 7) SD3-1024 MFU (the r4 claim's denominator)
run bench_sd3_1024_mfu 3600 $B -m naturaldiffusion_tpu.apps.bench_sd3 --latent 128 --steps 28
# 8) remaining sweep grids (lowest priority; each self-contained)
for fam_st in deis:15 dpmsolver:5 dpmsolver:15 dpmsolverpp:15; do
  fam=${fam_st%%:*}; st=${fam_st##*:}
  runlog sweep_${fam}_${st} 3000 $B -m naturaldiffusion_tpu.apps.sweep \
    --family $fam --steps $st --num 5120 --batch 256 --micro 64 --discrete \
    --out results/FID/${fam}_${st}step_sweep.csv
done
# 9) final default-bench bracket
run bench_final_default 2400 $B bench.py
echo "FINAL QUEUE DONE $(date +%H:%M:%S)" >> $D/queue.log
