#!/bin/bash
# After campaign6 (arm V2/V3): branch two arms off the V2 product —
#   W: aerial-window rebalance toward pose+com (rotation is solved; the
#      0.2 pose weight over-dilutes now) 500M @ 1e-4
#   X: torque authority (--torque-scale 2.5, untried idea 5; diag shows
#      cycle-1 apex 0.99 vs reference 1.18 = under-jump) 500M @ 1e-4
# then the non-backflip polish: jump +300M (0.649 -> goal >=0.65),
# getup_faceup +500M (0.710, dropped from 0.838 on the new dynamics).
set -x
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
until grep -q CAMPAIGN6_DONE logs/campaign6.log; do sleep 60; done
sleep 45

BASEFLAGS="--clip backflip --num-envs 2048 --action-mode residual --no-joint-limits --pose-termination 1.57 --env-set pose_termination_after_cycle=2.4 --env-set curriculum_phase_window=0.5,0.95 --env-set include_ref_root_offset=1 --train-set entropy_cost=0 --quiet"
DRIFT="--env-set drift_w=0.15 --env-set drift_s=3.0 --env-set curriculum_reset_prob=0.15"

cp -r ckpts/backflip_r3v ckpts/backflip_r3w
python -m pbrl_tpu.cli train $BASEFLAGS $DRIFT --total-steps 500000000 --lr 1e-4 \
  --env-set aerial_window=0.27,0.5 --env-set aerial_w_pose=0.35 \
  --env-set aerial_w_root=0.25 --env-set aerial_w_angvel=0.15 --env-set aerial_w_com=0.25 \
  --checkpoint-dir ckpts/backflip_r3w > logs/bf_r3_armW.log 2>&1
sleep 45
python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/backflip_r3w --num-envs 128 --steps 256 > logs/eval_bf_w.json 2>&1
sleep 45

cp -r ckpts/backflip_r3v ckpts/backflip_r3x
python -m pbrl_tpu.cli train $BASEFLAGS $DRIFT --total-steps 500000000 --lr 1e-4 \
  --env-set aerial_window=0.27,0.5 --torque-scale 2.5 \
  --checkpoint-dir ckpts/backflip_r3x > logs/bf_r3_armX.log 2>&1
sleep 45
python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/backflip_r3x --num-envs 128 --steps 256 > logs/eval_bf_x.json 2>&1
sleep 45

python -m pbrl_tpu.cli train --clip jump --num-envs 2048 --total-steps 300000000 --lr 1e-4 \
  --pose-termination 1.57 --env-set pose_termination_after_cycle=2.4 \
  --env-set curriculum_reset_prob=0.15 --env-set curriculum_phase_window=0.6,0.95 \
  --env-set include_ref_root_offset=1 --env-set rsi_noise_qpos=0.02 --env-set rsi_noise_qvel=0.2 \
  --train-set entropy_cost=0 --quiet \
  --checkpoint-dir ckpts/jump_r3 > logs/jump_r3b.log 2>&1
sleep 45
python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/jump_r3 --num-envs 128 --steps 256 > logs/eval_jump_r3b.json 2>&1
sleep 45

python -m pbrl_tpu.cli train --clip getup_faceup --num-envs 2048 --total-steps 500000000 --lr 1e-4 \
  --action-mode residual --no-joint-limits --no-early-termination --quiet \
  --checkpoint-dir ckpts/getup_faceup > logs/getup_faceup_r3b.log 2>&1
sleep 45
python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/getup_faceup --num-envs 128 --steps 256 > logs/eval_getup_faceup_r3b.json 2>&1
echo CAMPAIGN7_DONE
