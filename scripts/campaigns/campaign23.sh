#!/bin/bash
# Campaign 23 — backflip drift attack, chained strictly AFTER campaign 22.
#
# Why: the measured ceiling decomposition (scripts/backflip_ceiling.py,
# logs/backflip_ceiling.json) shows the shipped checkpoint's eval deficit
# is NOT the sigma wall: joint-space pose earns 0.650 while the WORLD-space
# terms are crushed by 0.2-0.3 m/cycle root-xy drift (ee 0.244 with ~0.19 m
# EE error ~ the drift magnitude; com 0.643). Zero drift at current joint
# tracking back-computes to eval ~0.59-0.62 — the 0.60 bar. Campaign 21's
# sigma-reset (AJ2: 0.4742 -> 0.4746) confirmed sigma is not the lever.
# Treatment: raise the anti-drift shaping weight during a low-LR polish
# (drift_w 0.15 -> 0.35, arm AK; 0.5 + wider curriculum window, arm AL) —
# `pbrl eval` strips shaping (cli.py:191-197), so the metric is unchanged
# and comparable. Promotion: strictly-better eval, as campaign 21.
#
# Log hygiene (VERDICT r3 weak #7): no set -x; decisions echoed explicitly.
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo

busy() {  # read-only /proc scan; never kill by pattern
  local pat=$1 p
  for p in /proc/[0-9]*/cmdline; do
    if tr '\0' ' ' < "$p" 2>/dev/null | grep -qE "$pat"; then
      return 0
    fi
  done
  return 1
}
while busy '^bash [^ ]*campaign2[012]\.sh|pbrl_tpu\.cli (train|eval|rollout|bench)|python bench\.py'; do
  sleep 60
done
sleep 120

wait_chip() {
  local n=0
  until timeout 300 python -c "import jax; print(jax.numpy.ones(8).sum())" >/dev/null 2>&1; do
    n=$((n+1)); echo "chip probe failed ($n), waiting 120s"; sleep 120
  done
  sleep 15
}

run_job() {
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

ev() {
python - "$1" <<'EOF'
import json, sys
try:
    last = [l for l in open(sys.argv[1]) if l.strip().startswith("{")][-1]
    print(json.loads(last)["eval_reward"])
except Exception:
    print(-1)
EOF
}

run_job 1500 logs/eval_bf_inc23.json python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/backflip --num-envs 128 --steps 256
sleep 45
BF_INC=$(ev logs/eval_bf_inc23.json)
echo "INCUMBENT backflip=$BF_INC"
python -c "import sys; sys.exit(0 if float('$BF_INC') > 0 else 1)" || exit 1

BFFLAGS=$(JAX_PLATFORMS=cpu python scripts/recipe_flags.py ckpts/backflip)
echo "BFFLAGS=$BFFLAGS"

# ---- AK: drift_w 0.35 polish ----
rm -rf ckpts/backflip_r4ak
cp -r ckpts/backflip ckpts/backflip_r4ak
run_job 3600 logs/bf_r4_armAK.log python -m pbrl_tpu.cli train --clip backflip --num-envs 2048 --quiet $BFFLAGS \
  --env-set drift_w=0.35 \
  --train-set reset_log_std=True --train-set init_log_std=-1.5 \
  --train-set entropy_cost=0 \
  --total-steps 300000000 --lr 5e-5 \
  --checkpoint-dir ckpts/backflip_r4ak
sleep 45
run_job 1500 logs/eval_bf_ak.json python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/backflip_r4ak --num-envs 128 --steps 256
sleep 45
AK=$(ev logs/eval_bf_ak.json)
echo "ARM_AK=$AK incumbent=$BF_INC"
BEST=$BF_INC
BESTDIR=ckpts/backflip
if python -c "import sys; sys.exit(0 if float('$AK') > float('$BF_INC') else 1)"; then
  BEST=$AK; BESTDIR=ckpts/backflip_r4ak
fi

# ---- AL: drift_w 0.5 + wider curriculum window, from the current best ----
rm -rf ckpts/backflip_r4al
cp -r "$BESTDIR" ckpts/backflip_r4al
run_job 3600 logs/bf_r4_armAL.log python -m pbrl_tpu.cli train --clip backflip --num-envs 2048 --quiet $BFFLAGS \
  --env-set drift_w=0.5 --env-set curriculum_phase_window=0.3,0.95 \
  --train-set reset_log_std=True --train-set init_log_std=-1.5 \
  --train-set entropy_cost=0 \
  --total-steps 300000000 --lr 5e-5 \
  --checkpoint-dir ckpts/backflip_r4al
sleep 45
run_job 1500 logs/eval_bf_al.json python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/backflip_r4al --num-envs 128 --steps 256
sleep 45
AL=$(ev logs/eval_bf_al.json)
echo "ARM_AL=$AL best_so_far=$BEST"
if python -c "import sys; sys.exit(0 if float('$AL') > float('$BEST') else 1)"; then
  BEST=$AL; BESTDIR=ckpts/backflip_r4al
fi

if [ "$BESTDIR" != "ckpts/backflip" ]; then
  echo "PROMOTE_BACKFLIP=$BESTDIR eval=$BEST"
  rm -rf ckpts/backflip && cp -r "$BESTDIR" ckpts/backflip
  run_job 1800 logs/render_bf_r4.log python -m pbrl_tpu.cli rollout \
    --checkpoint-dir ckpts/backflip --steps 240 \
    --out artifacts/backflip.npz --video artifacts/backflip.mp4 --camera back
  sleep 45
fi
# CPU transfer check on the final shipped backflip (criterion guard)
timeout 5400 python scripts/reward_parity.py --checkpoint-dir ckpts/backflip \
  --out /tmp/parity_bf23.md > logs/parity_bf23.json 2>&1 || true
echo CAMPAIGN23_DONE
