#!/bin/bash
# Campaign 18 — after campaign 17's closeout:
#   JB: jump precision arm — 300M @ 1e-4 with entropy_cost=-0.01 (the same
#       sigma-precision wall diagnosed on backflip binds jump at 0.649;
#       promote to ckpts/jump if it beats the incumbent eval).
#   AJ: backflip TRANSFER arm — the north star's parity clause. Best-eval
#       checkpoints overfit our contact details (R: 14.2% MuJoCo gap; S's
#       moderate RSI noise: 11.7%). Sequential contact-domain randomization:
#       3 x 150M resume rounds at contact_tc_scale 0.7 / 1.4 / 1.0 with
#       moderate RSI noise (qpos 0.03 / qvel 0.3), entropy_cost=0.
#       Measure BOTH eval and CPU-MuJoCo parity; promote to ckpts/backflip
#       only if parity <10% AND eval within 0.02 of the incumbent.
#   Then refresh PARITY.md on the shipped checkpoints.
set -x
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
until grep -q CAMPAIGN17_DONE logs/campaign17.log; do sleep 60; done
sleep 60

wait_chip() {
  local n=0
  until timeout 300 python -c "import jax; print(jax.numpy.ones(8).sum())" >/dev/null 2>&1; do
    n=$((n+1)); echo "chip probe failed ($n), waiting 120s"; sleep 120
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
    echo "RETRY attempt=$i rc=$rc"
    sleep 90
  done
  echo "JOB_FAILED: $*"
  return 1
}

ev() {  # ev <json> — last eval_reward in a log, or -1
python - "$1" <<'EOF'
import json, sys
try:
    last = [l for l in open(sys.argv[1]) if l.strip().startswith("{")][-1]
    print(json.loads(last)["eval_reward"])
except Exception:
    print(-1)
EOF
}

# ---- JB: jump entropy anneal ----
JFLAGS=$(python scripts/recipe_flags.py ckpts/jump)
echo "JFLAGS=$JFLAGS"
rm -rf ckpts/jump_r3jb
cp -r ckpts/jump ckpts/jump_r3jb
run_job 3600 logs/jump_r3jb.log python -m pbrl_tpu.cli train --clip jump --num-envs 2048 --quiet $JFLAGS \
  --train-set entropy_cost=-0.01 \
  --total-steps 300000000 --lr 1e-4 \
  --checkpoint-dir ckpts/jump_r3jb
sleep 45
run_job 1500 logs/eval_jump_r3jb.json python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/jump_r3jb --num-envs 128 --steps 256
sleep 45
jb=$(ev logs/eval_jump_r3jb.json)
jinc=$(python -c "
import json
best = -1
for f in ('logs/eval_jump_r3b.json', 'logs/eval_jump_r3c.json'):
    try:
        last = [l for l in open(f) if l.strip().startswith('{')][-1]
        best = max(best, json.loads(last)['eval_reward'])
    except Exception:
        pass
print(best)")
echo "JUMP_JB=$jb INCUMBENT=$jinc"
if python -c "import sys; sys.exit(0 if float('$jb') > float('$jinc') else 1)"; then
  echo "PROMOTE_JUMP=jump_r3jb"
  rm -rf ckpts/jump && cp -r ckpts/jump_r3jb ckpts/jump
fi

# ---- AJ: backflip transfer (sequential contact-domain randomization) ----
BFLAGS=$(python scripts/recipe_flags.py ckpts/backflip)
echo "BFLAGS=$BFLAGS"
rm -rf ckpts/backflip_r3aj
cp -r ckpts/backflip ckpts/backflip_r3aj
for tc in 0.7 1.4 1.0; do
  run_job 3600 "logs/bf_r3_armAJ_tc$tc.log" python -m pbrl_tpu.cli train --clip backflip --num-envs 2048 --quiet $BFLAGS \
    --env-set contact_tc_scale=$tc \
    --env-set rsi_noise_qpos=0.03 --env-set rsi_noise_qvel=0.3 \
    --train-set entropy_cost=0 \
    --total-steps 150000000 --lr 1e-4 \
    --checkpoint-dir ckpts/backflip_r3aj
  sleep 45
done
run_job 1500 logs/eval_bf_aj.json python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/backflip_r3aj --num-envs 128 --steps 256
sleep 45

# CPU parity of the transfer arm vs the incumbent (no chip needed)
python scripts/reward_parity.py --checkpoint-dir ckpts/backflip_r3aj --out /tmp/parity_aj.md > logs/parity_aj.json 2>&1
python scripts/reward_parity.py --checkpoint-dir ckpts/backflip --out /tmp/parity_inc.md > logs/parity_incumbent.json 2>&1

aj=$(ev logs/eval_bf_aj.json)
inc=$(ev logs/eval_backflip_final.json)
ajgap=$(python -c "
import json
l=[x for x in open('logs/parity_aj.json') if x.strip().startswith('{')][-1]
print(json.loads(l)['relative_gap'])" 2>/dev/null || echo 1)
incgap=$(python -c "
import json
l=[x for x in open('logs/parity_incumbent.json') if x.strip().startswith('{')][-1]
print(json.loads(l)['relative_gap'])" 2>/dev/null || echo 1)
echo "AJ eval=$aj gap=$ajgap | incumbent eval=$inc gap=$incgap"
# Promote only on strict improvement: better transfer than the incumbent
# (AA already measures 7.8% < the 10% criterion) at essentially equal eval.
if python -c "import sys; sys.exit(0 if (float('$ajgap') < float('$incgap') and float('$aj') >= float('$inc') - 0.01) else 1)"; then
  echo "PROMOTE_BACKFLIP=backflip_r3aj"
  rm -rf ckpts/backflip && cp -r ckpts/backflip_r3aj ckpts/backflip
fi

# ---- final PARITY.md refresh on shipped checkpoints ----
python scripts/reward_parity.py --checkpoint-dir ckpts/walk --checkpoint-dir ckpts/backflip --checkpoint-dir ckpts/getup > logs/parity_final.json 2>&1
echo CAMPAIGN18_DONE
