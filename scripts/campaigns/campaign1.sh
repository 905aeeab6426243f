#!/bin/bash
set -x
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
# backflip polish: resume ckpts/backflip_pt, +500M at lower LR
python -m pbrl_tpu.cli train --clip backflip --num-envs 2048 --total-steps 500000000 \
  --action-mode residual --no-joint-limits --pose-termination 1.57 --lr 0.00015 \
  --checkpoint-dir ckpts/backflip_pt --quiet > logs/backflip_r2d.log 2>&1
python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/backflip_pt --num-envs 128 --steps 256 > logs/eval_backflip_pt2.json 2>&1
# the three missing clips
python -m pbrl_tpu.cli train --clip kick --num-envs 2048 --total-steps 200000000 \
  --action-mode residual --no-joint-limits \
  --checkpoint-dir ckpts/kick --quiet > logs/kick_r2.log 2>&1
python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/kick --num-envs 128 --steps 256 > logs/eval_kick.json 2>&1
python -m pbrl_tpu.cli train --clip punch --num-envs 2048 --total-steps 200000000 \
  --action-mode residual --no-joint-limits \
  --checkpoint-dir ckpts/punch --quiet > logs/punch_r2.log 2>&1
python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/punch --num-envs 128 --steps 256 > logs/eval_punch.json 2>&1
python -m pbrl_tpu.cli train --clip getup_faceup --num-envs 2048 --total-steps 200000000 \
  --action-mode residual --no-joint-limits --no-early-termination \
  --checkpoint-dir ckpts/getup_faceup --quiet > logs/getup_faceup_r2.log 2>&1
python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/getup_faceup --num-envs 128 --steps 256 > logs/eval_getup_faceup.json 2>&1
echo CAMPAIGN1_DONE
