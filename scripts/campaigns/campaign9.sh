#!/bin/bash
# After campaign8: pick the best backflip arm among V2(r3v)/V3(r3v3)/W/X by
# eval_reward, then branch two qualitatively-new levers off it:
#   Y: gamma 0.98 — at 60 Hz policy and gamma 0.95 the value horizon is
#      ~20 steps (0.33 s) but a flip cycle is ~105 steps; the crouch cannot
#      see the apex/landing in its return. 1B @ 1e-4.
#   Z: drift-precision polish — drift_s 3->20 (gradient alive below 10 cm),
#      drift_w 0.2. 500M @ 1e-4.
set -x
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
until grep -q CAMPAIGN8_DONE logs/campaign8.log; do sleep 60; done
sleep 45

best=$(python - <<'EOF'
import json, os
cands = {"backflip_r3v": "logs/eval_bf_v2.json",
         "backflip_r3v3": "logs/eval_bf_v3.json",
         "backflip_r3w": "logs/eval_bf_w.json",
         "backflip_r3x": "logs/eval_bf_x.json"}
scores = {}
for name, f in cands.items():
    try:
        last = [l for l in open(f) if l.strip().startswith("{")][-1]
        scores[name] = json.loads(last)["eval_reward"]
    except Exception:
        pass
print(max(scores, key=scores.get))
EOF
)
echo "BEST_ARM=$best"

BASEFLAGS="--clip backflip --num-envs 2048 --action-mode residual --no-joint-limits --pose-termination 1.57 --env-set pose_termination_after_cycle=2.4 --env-set aerial_window=0.27,0.5 --env-set curriculum_phase_window=0.5,0.95 --env-set include_ref_root_offset=1 --train-set entropy_cost=0 --quiet"
DRIFT="--env-set drift_w=0.15 --env-set drift_s=3.0 --env-set curriculum_reset_prob=0.15"
EXTRA=""
case "$best" in
  backflip_r3w) EXTRA="--env-set aerial_w_pose=0.35 --env-set aerial_w_root=0.25 --env-set aerial_w_angvel=0.15 --env-set aerial_w_com=0.25" ;;
  backflip_r3x) EXTRA="--torque-scale 2.5" ;;
esac

cp -r "ckpts/$best" ckpts/backflip_r3y
python -m pbrl_tpu.cli train $BASEFLAGS $DRIFT $EXTRA --total-steps 1000000000 --lr 1e-4 \
  --gamma 0.98 \
  --checkpoint-dir ckpts/backflip_r3y > logs/bf_r3_armY.log 2>&1
sleep 45
python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/backflip_r3y --num-envs 128 --steps 256 > logs/eval_bf_y.json 2>&1
sleep 45

cp -r "ckpts/$best" ckpts/backflip_r3z
python -m pbrl_tpu.cli train $BASEFLAGS $EXTRA --total-steps 500000000 --lr 1e-4 \
  --env-set drift_w=0.2 --env-set drift_s=20.0 --env-set curriculum_reset_prob=0.15 \
  --checkpoint-dir ckpts/backflip_r3z > logs/bf_r3_armZ.log 2>&1
sleep 45
python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/backflip_r3z --num-envs 128 --steps 256 > logs/eval_bf_z.json 2>&1
echo CAMPAIGN9_DONE
