#!/bin/bash
set -x
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
# backflip-E: resume 1B-ckpt lineage, add RSI reset noise (funnel to the
# reference from off-states, e.g. imperfect landings)
python -m pbrl_tpu.cli train --clip backflip --num-envs 2048 --total-steps 500000000 \
  --action-mode residual --no-joint-limits --pose-termination 1.57 --lr 0.00015 \
  --env-set rsi_noise_qpos=0.03 --env-set rsi_noise_qvel=0.2 \
  --checkpoint-dir ckpts/backflip_pt --quiet > logs/backflip_r2e.log 2>&1
python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/backflip_pt --num-envs 128 --steps 256 > logs/eval_backflip_e.json 2>&1
# re-measure round-1 checkpoints under the round-2 physics
for s in walk jump getup; do
  python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/$s --num-envs 128 --steps 300 > logs/eval_${s}_r2.json 2>&1
done
echo CAMPAIGN2_DONE
