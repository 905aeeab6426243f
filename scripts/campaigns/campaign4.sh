#!/bin/bash
set -x
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
for seed in 1 2; do
  python -m pbrl_tpu.cli train --clip backflip --num-envs 2048 --total-steps 500000000 \
    --action-mode residual --no-joint-limits --pose-termination 1.57 --seed $seed \
    --checkpoint-dir ckpts/backflip_s$seed --quiet > logs/backflip_seed$seed.log 2>&1
  python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/backflip_s$seed --num-envs 128 --steps 256 > logs/eval_backflip_s$seed.json 2>&1
done
echo CAMPAIGN4_DONE
