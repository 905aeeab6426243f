#!/bin/bash
# After campaign10: precision polish + jump closeout.
#   AC: entropy-anneal — final-entropy diagnostics show exploration sigma
#       stays ~0.53 rad/joint even with entropy_cost=0 (the std never
#       anneals; fixed-std RESETS regressed in arms I/O/M, but a *gradual*
#       anneal via a small negative entropy cost is untried). 500M @ 1e-4.
#   AD: low-LR polish of the then-best arm (V3's +0.006 recipe): 300M @ 3e-5,
#       entropy_cost back to 0.
#   Jump: 300M @ 3e-5 polish of jump_r3 (eval 0.6488; target >=0.65).
set -x
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
until grep -q CAMPAIGN10_DONE logs/campaign10.log; do sleep 60; done
sleep 45

pick_best() {
python - "$@" <<'EOF'
import json, sys
scores = {}
for pair in sys.argv[1:]:
    name, f = pair.split(":")
    try:
        last = [l for l in open(f) if l.strip().startswith("{")][-1]
        scores[name] = json.loads(last)["eval_reward"]
    except Exception:
        pass
print(max(scores, key=scores.get))
EOF
}

CANDS="backflip_r3v3:logs/eval_bf_v3.json backflip_r3w:logs/eval_bf_w.json backflip_r3x:logs/eval_bf_x.json backflip_r3y:logs/eval_bf_y.json backflip_r3z:logs/eval_bf_z.json backflip_r3aa:logs/eval_bf_aa.json backflip_r3ab:logs/eval_bf_ab.json"
best=$(pick_best $CANDS)
echo "BEST_ARM=$best"
FLAGS=$(python scripts/recipe_flags.py "ckpts/$best")
echo "FLAGS=$FLAGS"

cp -r "ckpts/$best" ckpts/backflip_r3ac
python -m pbrl_tpu.cli train --clip backflip --num-envs 2048 --quiet $FLAGS \
  --train-set entropy_cost=-0.0005 \
  --total-steps 500000000 --lr 1e-4 \
  --checkpoint-dir ckpts/backflip_r3ac > logs/bf_r3_armAC.log 2>&1
sleep 45
python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/backflip_r3ac --num-envs 128 --steps 256 > logs/eval_bf_ac.json 2>&1
sleep 45

best2=$(pick_best $CANDS backflip_r3ac:logs/eval_bf_ac.json)
echo "BEST_ARM2=$best2"
FLAGS2=$(python scripts/recipe_flags.py "ckpts/$best2")
cp -r "ckpts/$best2" ckpts/backflip_r3ad
python -m pbrl_tpu.cli train --clip backflip --num-envs 2048 --quiet $FLAGS2 \
  --train-set entropy_cost=0 \
  --env-set curriculum_reset_prob=0.05 \
  --total-steps 300000000 --lr 3e-5 \
  --checkpoint-dir ckpts/backflip_r3ad > logs/bf_r3_armAD.log 2>&1
sleep 45
python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/backflip_r3ad --num-envs 128 --steps 256 > logs/eval_bf_ad.json 2>&1
sleep 45

JFLAGS=$(python scripts/recipe_flags.py ckpts/jump_r3)
cp -r ckpts/jump_r3 ckpts/jump_r3c
python -m pbrl_tpu.cli train --clip jump --num-envs 2048 --quiet $JFLAGS \
  --total-steps 300000000 --lr 3e-5 \
  --checkpoint-dir ckpts/jump_r3c > logs/jump_r3c.log 2>&1
sleep 45
python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/jump_r3c --num-envs 128 --steps 256 > logs/eval_jump_r3c.json 2>&1
echo CAMPAIGN11_DONE
