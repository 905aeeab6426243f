#!/bin/bash
# After campaign9: the drift-correction attack. Reward decomposition shows
# horizontal drift is the dominant eval loss (com term exp(-10 e^2)=0.136
# => ~0.45 m accumulated error; phase_eval.py shows the loss is uniform
# across start phases, not a bad-phase artifact). RSI noise never displaces
# the root, so the policy has only ever *tolerated* drift, never practiced
# steering back from an off-track start. Two arms off the best lineage:
#   AA: + rsi_noise_root_xy=0.25 (observable via include_ref_root_offset)
#   AB: AA + drift precision (drift_w 0.2, drift_s 20)
set -x
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
until grep -q CAMPAIGN9_DONE logs/campaign9.log; do sleep 60; done
sleep 45

best=$(python - <<'EOF'
import json
cands = {"backflip_r3v3": "logs/eval_bf_v3.json",
         "backflip_r3w": "logs/eval_bf_w.json",
         "backflip_r3x": "logs/eval_bf_x.json",
         "backflip_r3y": "logs/eval_bf_y.json",
         "backflip_r3z": "logs/eval_bf_z.json"}
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
FLAGS=$(python scripts/recipe_flags.py "ckpts/$best")
echo "FLAGS=$FLAGS"

cp -r "ckpts/$best" ckpts/backflip_r3aa
python -m pbrl_tpu.cli train --clip backflip --num-envs 2048 --quiet $FLAGS \
  --env-set rsi_noise_root_xy=0.25 --env-set curriculum_reset_prob=0.15 \
  --total-steps 500000000 --lr 1e-4 \
  --checkpoint-dir ckpts/backflip_r3aa > logs/bf_r3_armAA.log 2>&1
sleep 45
python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/backflip_r3aa --num-envs 128 --steps 256 > logs/eval_bf_aa.json 2>&1
sleep 45

cp -r "ckpts/$best" ckpts/backflip_r3ab
python -m pbrl_tpu.cli train --clip backflip --num-envs 2048 --quiet $FLAGS \
  --env-set rsi_noise_root_xy=0.25 --env-set curriculum_reset_prob=0.15 \
  --env-set drift_w=0.2 --env-set drift_s=20.0 \
  --total-steps 500000000 --lr 1e-4 \
  --checkpoint-dir ckpts/backflip_r3ab > logs/bf_r3_armAB.log 2>&1
sleep 45
python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/backflip_r3ab --num-envs 128 --steps 256 > logs/eval_bf_ab.json 2>&1
echo CAMPAIGN10_DONE
