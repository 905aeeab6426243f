#!/bin/bash
# Arm V2: continue the drift-shaping lineage (arm V, eval 0.456 = round best)
# another 1B @ lr 1e-4, then a 300M lr-3e-5 polish (arm V3). Waits for
# campaign5 (arm U) to release the chip.
set -x
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
until grep -q CAMPAIGN5_DONE logs/campaign5.log; do sleep 60; done
sleep 45

BASEFLAGS="--clip backflip --num-envs 2048 --action-mode residual --no-joint-limits --pose-termination 1.57 --env-set pose_termination_after_cycle=2.4 --env-set aerial_window=0.27,0.5 --env-set curriculum_phase_window=0.5,0.95 --env-set include_ref_root_offset=1 --train-set entropy_cost=0 --quiet"
DRIFT="--env-set drift_w=0.15 --env-set drift_s=3.0 --env-set curriculum_reset_prob=0.15"

python -m pbrl_tpu.cli train $BASEFLAGS $DRIFT --total-steps 1000000000 --lr 1e-4 \
  --checkpoint-dir ckpts/backflip_r3v > logs/bf_r3_armV2.log 2>&1
sleep 45
python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/backflip_r3v --num-envs 128 --steps 256 > logs/eval_bf_v2.json 2>&1
sleep 45

# V3 polish: low LR, curriculum decayed, drift kept
cp -r ckpts/backflip_r3v ckpts/backflip_r3v3
python -m pbrl_tpu.cli train $BASEFLAGS --total-steps 300000000 --lr 3e-5 \
  --env-set drift_w=0.15 --env-set drift_s=3.0 --env-set curriculum_reset_prob=0.05 \
  --checkpoint-dir ckpts/backflip_r3v3 > logs/bf_r3_armV3.log 2>&1
sleep 45
python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/backflip_r3v3 --num-envs 128 --steps 256 > logs/eval_bf_v3.json 2>&1
echo CAMPAIGN6_DONE
