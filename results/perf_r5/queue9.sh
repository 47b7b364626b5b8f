#!/bin/bash
# r5 queue 9 (chains on QUEUE8 DONE): controllable-generation retry with the
# reference's VP PC config (euler_maruyama predictor, no corrector) — the
# langevin-corrector run diverged in the unknown region on the toy score
# (finite but |x|~57); A/B both configs' artifacts stay committed.
set -u
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
D=results/perf_r5

while ! grep -q "QUEUE8 DONE" $D/queue.log; do sleep 30; done

echo "=== controllable_em $(date +%H:%M:%S)" >> $D/queue.log
timeout 2400 python -m naturaldiffusion_tpu.apps.controllable_eval \
  --workdir /tmp/roundtrip_work --outdir $D/controllable_em \
  --predictor euler_maruyama --corrector none --num 16 --seeds 2 \
  > $D/controllable_em.log 2>&1
echo "controllable_em rc=$?" >> $D/queue.log
echo "QUEUE9 DONE $(date +%H:%M:%S)" >> $D/queue.log
