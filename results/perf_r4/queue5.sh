#!/bin/bash
# r4 queue 5: finish the sweep grids (the two cells the 2400s windows cut
# off), then the bf16 mixed-precision train-step A/B (PERF.md pending row).
set -u
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
D=results/perf_r4

while ! grep -q "QUEUE4 DONE" $D/queue.log; do sleep 20; done

for fam in dpmsolverpp dpmsolver; do
  if ! grep -q "^random,multistep,3," results/FID/${fam}_10step_sweep.csv; then
    echo "=== resume $fam multistep:3 $(date +%H:%M:%S)" >> $D/queue.log
    timeout 1500 python -m naturaldiffusion_tpu.apps.sweep --family $fam \
      --num 5120 --batch 256 --micro 64 --only multistep:3 \
      --out $D/${fam}_resume.csv >> $D/sweep_${fam}.log 2>&1
    echo "resume $fam rc=$?" >> $D/queue.log
    python - "$fam" <<'EOF'
import csv, sys
fam = sys.argv[1]
main = f"results/FID/{fam}_10step_sweep.csv"
res = f"results/perf_r4/{fam}_resume.csv"
rows = list(csv.DictReader(open(main)))
rows += list(csv.DictReader(open(res)))
with open(main, "w", newline="") as fh:
    w = csv.DictWriter(fh, fieldnames=list(rows[0].keys()))
    w.writeheader(); w.writerows(rows)
print(f"merged {res} -> {main} ({len(rows)} cells)")
EOF
  fi
done

echo "=== bench_train bf16 b128 $(date +%H:%M:%S)" >> $D/queue.log
timeout 1800 python -m naturaldiffusion_tpu.apps.bench_train \
  --batch 128 --chain 8 --bf16 \
  > $D/bench_train_bf16.json 2> $D/bench_train_bf16.err
echo "bench_train bf16 b128 rc=$?" >> $D/queue.log

echo "=== bench_train bf16 b256 $(date +%H:%M:%S)" >> $D/queue.log
timeout 1800 python -m naturaldiffusion_tpu.apps.bench_train \
  --batch 256 --chain 8 --bf16 \
  > $D/bench_train_bf16_b256.json 2> $D/bench_train_bf16_b256.err
echo "bench_train bf16 b256 rc=$?" >> $D/queue.log

echo "QUEUE5 DONE $(date +%H:%M:%S)" >> $D/queue.log
