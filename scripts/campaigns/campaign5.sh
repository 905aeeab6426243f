#!/bin/bash
# Round-3 backflip arms V (drift shaping) and U (low-LR precision continue),
# both branched from arm R's lineage (ckpts/backflip_r3n, eval 0.450).
# Serial chip jobs with settle gaps (axon tunnel wedge: never overlap).
set -x
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo

BASEFLAGS="--clip backflip --num-envs 2048 --action-mode residual --no-joint-limits --pose-termination 1.57 --env-set pose_termination_after_cycle=2.4 --env-set aerial_window=0.27,0.5 --env-set curriculum_phase_window=0.5,0.95 --env-set include_ref_root_offset=1 --train-set entropy_cost=0 --quiet"

# Arm V: anti-drift shaping (drift_w=0.15, s=3) on R's recipe, 500M @ lr 1e-4
cp -r ckpts/backflip_r3n ckpts/backflip_r3v
python -m pbrl_tpu.cli train $BASEFLAGS --total-steps 500000000 --lr 1e-4 \
  --env-set curriculum_reset_prob=0.15 \
  --env-set drift_w=0.15 --env-set drift_s=3.0 \
  --checkpoint-dir ckpts/backflip_r3v > logs/bf_r3_armV.log 2>&1
sleep 45
python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/backflip_r3v --num-envs 128 --steps 256 > logs/eval_bf_v.json 2>&1
sleep 45

# Arm U: precision continue, 1B @ lr 5e-5, curriculum decayed to 0.05
cp -r ckpts/backflip_r3n ckpts/backflip_r3u
python -m pbrl_tpu.cli train $BASEFLAGS --total-steps 1000000000 --lr 5e-5 \
  --env-set curriculum_reset_prob=0.05 \
  --checkpoint-dir ckpts/backflip_r3u > logs/bf_r3_armU.log 2>&1
sleep 45
python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/backflip_r3u --num-envs 128 --steps 256 > logs/eval_bf_u.json 2>&1
echo CAMPAIGN5_DONE
