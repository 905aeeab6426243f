#!/bin/bash
# Closeout: promote the winning lineages to canonical ckpt names, refresh
# the kick/punch eval JSONs (their round-3 numbers only exist in a commit
# message), re-render all 7 skill GIFs on the final policies, and record a
# bench sanity number. Runs after campaign11.
set -x
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
until grep -q CAMPAIGN15_DONE logs/campaign15.log; do sleep 60; done
sleep 45

best=$(python - <<'EOF'
import json
cands = {"backflip_r3v3": "logs/eval_bf_v3.json",
         "backflip_r3w": "logs/eval_bf_w.json",
         "backflip_r3x": "logs/eval_bf_x.json",
         "backflip_r3y": "logs/eval_bf_y.json",
         "backflip_r3z": "logs/eval_bf_z.json",
         "backflip_r3aa": "logs/eval_bf_aa.json",
         "backflip_r3ab": "logs/eval_bf_ab.json",
         "backflip_r3ac": "logs/eval_bf_ac.json",
         "backflip_r3ad": "logs/eval_bf_ad.json",
         "backflip_r3ae": "logs/eval_bf_ae.json",
         "backflip_r3af": "logs/eval_bf_af.json",
         "backflip_r3ag": "logs/eval_bf_ag.json",
         "backflip_r3ah": "logs/eval_bf_ah.json",
         "backflip_r3ai": "logs/eval_bf_ai.json"}
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
echo "FINAL_BACKFLIP=$best"
rm -rf ckpts/backflip && cp -r "ckpts/$best" ckpts/backflip

jbest=$(python - <<'EOF'
import json
scores = {}
for name, f in (("jump_r3", "logs/eval_jump_r3b.json"),
                ("jump_r3c", "logs/eval_jump_r3c.json")):
    try:
        last = [l for l in open(f) if l.strip().startswith("{")][-1]
        scores[name] = json.loads(last)["eval_reward"]
    except Exception:
        pass
print(max(scores, key=scores.get))
EOF
)
echo "FINAL_JUMP=$jbest"
rm -rf ckpts/jump && cp -r "ckpts/$jbest" ckpts/jump

python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/kick --num-envs 128 --steps 256 > logs/eval_kick_r3.json 2>&1
sleep 45
python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/punch --num-envs 128 --steps 256 > logs/eval_punch_r3.json 2>&1
sleep 45
python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/backflip --num-envs 128 --steps 256 > logs/eval_backflip_final.json 2>&1
sleep 45

OUT=artifacts bash scripts/render_all_skills.sh > logs/render_r3.log 2>&1
sleep 45
python bench.py > logs/bench_r3.json 2>&1
echo CAMPAIGN12_DONE
