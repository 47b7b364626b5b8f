#!/bin/bash
# r5 queue 4 (chains on QUEUE3 DONE): training-step ladder (VERDICT r5
# task 3: profile + lift 55% MFU), per-op int8 A/B evidence, and the
# DiT/SD3 benches now reporting auditable MFU (task 7).
set -u
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
D=results/perf_r5

while ! grep -q "QUEUE3 DONE" $D/queue.log; do sleep 30; done

run () {
  local tag="$1"; shift
  echo "=== $tag $(date +%H:%M:%S)" >> $D/queue.log
  "$@" > $D/$tag.json 2> $D/$tag.err
  echo "$tag rc=$?" >> $D/queue.log
}

B=python
run train_b512_ctl   timeout 2400 $B -m naturaldiffusion_tpu.apps.bench_train --batch 512 --bf16
run train_b512_m64   timeout 2400 $B -m naturaldiffusion_tpu.apps.bench_train --batch 512 --bf16 --micro 64
run train_b512_m128  timeout 2400 $B -m naturaldiffusion_tpu.apps.bench_train --batch 512 --bf16 --micro 128
run train_b512_remat timeout 2400 $B -m naturaldiffusion_tpu.apps.bench_train --batch 512 --bf16 --remat
run train_b1024_m128 timeout 2400 $B -m naturaldiffusion_tpu.apps.bench_train --batch 1024 --bf16 --micro 128
echo "=== train trace $(date +%H:%M:%S)" >> $D/queue.log
timeout 2400 $B -m naturaldiffusion_tpu.apps.bench_train --batch 512 --bf16 \
  --trace $D/trace_train_b512 > $D/train_b512_trace.json 2> $D/train_b512_trace.err
echo "train trace rc=$?" >> $D/queue.log
timeout 600 $B -m naturaldiffusion_tpu.utils.trace_summary $D/trace_train_b512 \
  > $D/trace_train_b512_summary.txt 2>&1

run quant_ops timeout 3600 $B -m naturaldiffusion_tpu.apps.bench_quant_ops --reps 30 --runs 7
run bench_dit_mfu timeout 2400 $B -m naturaldiffusion_tpu.apps.bench_dit --steps 50 --batch 1
run bench_sd3_mfu timeout 3000 $B -m naturaldiffusion_tpu.apps.bench_sd3 --latent 64 --steps 28

echo "QUEUE4 DONE $(date +%H:%M:%S)" >> $D/queue.log
