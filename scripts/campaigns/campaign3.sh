#!/bin/bash
set -x
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
# clean deterministic re-eval of backflip_pt (eval zeroes reset noise now)
python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/backflip_pt --num-envs 128 --steps 256 > logs/eval_backflip_clean.json 2>&1
# jump: resume round-1 params +300M under round-2 physics (backfills run_config)
python -m pbrl_tpu.cli train --clip jump --num-envs 2048 --total-steps 300000000 \
  --checkpoint-dir ckpts/jump --quiet > logs/jump_r2.log 2>&1
python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/jump --num-envs 128 --steps 256 > logs/eval_jump_r2b.json 2>&1
# getup_facedown: resume round-1 params +300M (same recipe as round 1)
python -m pbrl_tpu.cli train --clip getup_facedown --num-envs 2048 --total-steps 300000000 \
  --action-mode residual --no-joint-limits --no-early-termination \
  --checkpoint-dir ckpts/getup --quiet > logs/getup_r2.log 2>&1
python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/getup --num-envs 128 --steps 256 > logs/eval_getup_r2b.json 2>&1
# backflip arm: DeepMimic's exact rates (variant 2: 30 Hz policy, 1200 Hz physics)
python -m pbrl_tpu.cli train --clip backflip --num-envs 2048 --total-steps 300000000 \
  --action-mode residual --no-joint-limits --pose-termination 1.57 \
  --policy-dt 0.033333333 --physics-dt 0.000833333 \
  --checkpoint-dir ckpts/backflip_v2rates --quiet > logs/backflip_r2f.log 2>&1
python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/backflip_v2rates --num-envs 128 --steps 128 > logs/eval_backflip_v2rates.json 2>&1
echo CAMPAIGN3_DONE
