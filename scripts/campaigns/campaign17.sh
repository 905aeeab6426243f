#!/bin/bash
# Campaign 17 (v2) — replaces campaigns 13(remainder)+15+16 with ONE
# strictly-serial, wedge-protected chain. The axon tunnel deadlocks when a
# chip job starts during another's release; symptoms are either an instant
# "Unable to initialize backend 'axon'" or a hang with zero CPU progress.
# Protection: health-probe before every job, hard timeout on every job,
# retry loop (3 attempts) on failure.
#
# Arms:
#   AG: 500M rsi_noise_root_xy=0.5 (full observed drift range)   [from c13]
#   AE: +1B consolidation of best(y,z,aa..ad,ag), recipe unchanged
#   AF: 500M curriculum_recenter_xy=0 (true-drift curriculum)
#   AH: 500M entropy_cost=-0.01 (strong anneal; sigma 0.52 precision wall)
#   AI: 300M @ 3e-5 low-LR polish of best incl AH
#   closeout: promote winners, refresh eval JSONs, re-render GIFs, bench.
set -x
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo

wait_chip() {
  local n=0
  until timeout 300 python -c "import jax; print(jax.numpy.ones(8).sum())" >/dev/null 2>&1; do
    n=$((n+1)); echo "chip probe failed ($n), waiting 120s"; sleep 120
    if [ $n -ge 30 ]; then echo "CHIP_UNAVAILABLE_1H"; fi
  done
  sleep 15
}

run_job() {  # run_job <timeout_s> <logfile> <cmd...>
  local t=$1 log=$2; shift 2
  for i in 1 2 3; do
    wait_chip
    timeout "$t" "$@" > "$log" 2>&1
    local rc=$?
    if [ $rc -eq 0 ] && ! grep -q "Unable to initialize backend" "$log"; then
      return 0
    fi
    echo "RETRY attempt=$i rc=$rc cmd=$1"
    sleep 90
  done
  echo "JOB_FAILED: $*"
  return 1
}

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

# Drop the stale AA-copies + mislabeled/empty evals from the wedged run.
rm -rf ckpts/backflip_r3ae ckpts/backflip_r3af
rm -f logs/eval_bf_ae.json logs/eval_bf_af.json

CANDS0="backflip_r3y:logs/eval_bf_y.json backflip_r3z:logs/eval_bf_z.json backflip_r3aa:logs/eval_bf_aa.json backflip_r3ab:logs/eval_bf_ab.json backflip_r3ac:logs/eval_bf_ac.json backflip_r3ad:logs/eval_bf_ad.json"
best0=$(pick_best $CANDS0)
echo "BEST_ARM0=$best0"
FLAGS0=$(python scripts/recipe_flags.py "ckpts/$best0")
echo "FLAGS0=$FLAGS0"

# ---- AG (campaign13's lost third arm) ----
rm -rf ckpts/backflip_r3ag
cp -r "ckpts/$best0" ckpts/backflip_r3ag
run_job 4500 logs/bf_r3_armAG.log python -m pbrl_tpu.cli train --clip backflip --num-envs 2048 --quiet $FLAGS0 \
  --env-set rsi_noise_root_xy=0.5 \
  --total-steps 500000000 --lr 1e-4 \
  --checkpoint-dir ckpts/backflip_r3ag
sleep 45
run_job 1500 logs/eval_bf_ag.json python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/backflip_r3ag --num-envs 128 --steps 256
sleep 45

CANDS="$CANDS0 backflip_r3ag:logs/eval_bf_ag.json"
best=$(pick_best $CANDS)
echo "BEST_ARM=$best"
FLAGS=$(python scripts/recipe_flags.py "ckpts/$best")
echo "FLAGS=$FLAGS"

# ---- AE: +1B consolidation ----
cp -r "ckpts/$best" ckpts/backflip_r3ae
run_job 9000 logs/bf_r3_armAE.log python -m pbrl_tpu.cli train --clip backflip --num-envs 2048 --quiet $FLAGS \
  --total-steps 1000000000 --lr 1e-4 \
  --checkpoint-dir ckpts/backflip_r3ae
sleep 45
run_job 1500 logs/eval_bf_ae.json python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/backflip_r3ae --num-envs 128 --steps 256
sleep 45

# ---- AF: true-drift curriculum ----
cp -r "ckpts/$best" ckpts/backflip_r3af
run_job 4500 logs/bf_r3_armAF.log python -m pbrl_tpu.cli train --clip backflip --num-envs 2048 --quiet $FLAGS \
  --env-set curriculum_recenter_xy=0 \
  --total-steps 500000000 --lr 1e-4 \
  --checkpoint-dir ckpts/backflip_r3af
sleep 45
run_job 1500 logs/eval_bf_af.json python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/backflip_r3af --num-envs 128 --steps 256
sleep 45

CANDS2="$CANDS backflip_r3ae:logs/eval_bf_ae.json backflip_r3af:logs/eval_bf_af.json"
best2=$(pick_best $CANDS2)
echo "BEST_ARM2=$best2"
FLAGS2=$(python scripts/recipe_flags.py "ckpts/$best2")

# ---- AH: strong entropy anneal ----
rm -rf ckpts/backflip_r3ah
cp -r "ckpts/$best2" ckpts/backflip_r3ah
run_job 4500 logs/bf_r3_armAH.log python -m pbrl_tpu.cli train --clip backflip --num-envs 2048 --quiet $FLAGS2 \
  --train-set entropy_cost=-0.01 \
  --total-steps 500000000 --lr 1e-4 \
  --checkpoint-dir ckpts/backflip_r3ah
sleep 45
run_job 1500 logs/eval_bf_ah.json python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/backflip_r3ah --num-envs 128 --steps 256
sleep 45

CANDS3="$CANDS2 backflip_r3ah:logs/eval_bf_ah.json"
best3=$(pick_best $CANDS3)
echo "BEST_ARM3=$best3"
FLAGS3=$(python scripts/recipe_flags.py "ckpts/$best3")

# ---- AI: low-LR polish ----
rm -rf ckpts/backflip_r3ai
cp -r "ckpts/$best3" ckpts/backflip_r3ai
run_job 3600 logs/bf_r3_armAI.log python -m pbrl_tpu.cli train --clip backflip --num-envs 2048 --quiet $FLAGS3 \
  --train-set entropy_cost=0 \
  --env-set curriculum_reset_prob=0.05 \
  --total-steps 300000000 --lr 3e-5 \
  --checkpoint-dir ckpts/backflip_r3ai
sleep 45
run_job 1500 logs/eval_bf_ai.json python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/backflip_r3ai --num-envs 128 --steps 256
sleep 45

# ---- closeout ----
final=$(pick_best $CANDS3 backflip_r3ai:logs/eval_bf_ai.json backflip_r3v3:logs/eval_bf_v3.json backflip_r3w:logs/eval_bf_w.json backflip_r3x:logs/eval_bf_x.json)
echo "FINAL_BACKFLIP=$final"
rm -rf ckpts/backflip && cp -r "ckpts/$final" ckpts/backflip

jbest=$(pick_best jump_r3:logs/eval_jump_r3b.json jump_r3c:logs/eval_jump_r3c.json)
echo "FINAL_JUMP=$jbest"
rm -rf ckpts/jump && cp -r "ckpts/$jbest" ckpts/jump

run_job 1500 logs/eval_kick_r3.json python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/kick --num-envs 128 --steps 256
sleep 45
run_job 1500 logs/eval_punch_r3.json python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/punch --num-envs 128 --steps 256
sleep 45
run_job 1500 logs/eval_backflip_final.json python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/backflip --num-envs 128 --steps 256
sleep 45

wait_chip
OUT=artifacts timeout 5400 bash scripts/render_all_skills.sh > logs/render_r3.log 2>&1
sleep 45
run_job 2400 logs/bench_r3.json python bench.py
echo CAMPAIGN17_DONE
