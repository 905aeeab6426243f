#!/bin/bash
# Campaign 25 — jump drift attack, chained strictly AFTER campaign 24's
# evidence chores and campaigns 22/23 (the chain wrapper runs 24->22->23;
# this script self-serializes behind all three).
#
# Why: jump sits at 0.6484 vs the round-2 "done >=0.65" line. Campaign 21's
# sigma-reset arm JS REGRESSED it (0.602), so sigma is not the lever here
# either. The r3c training decomposition (logs/jump_r3c.log final) shows the
# same signature the backflip ceiling measurement found: joint-space pose is
# strong (raw 0.885) while the WORLD-space terms are crushed (ee 0.044,
# com 0.078, vel 0.064 raw) — root-xy drift across the ~2.4 wrapped cycles
# of a 256-step eval. Treatment: the campaign-23 anti-drift shaping polish
# (drift_w 0.25 arm JD, then 0.5 from the best, arm JE), keeping the
# incumbent's sigma. `pbrl eval` strips shaping (cli.py:191-197), so the
# metric stays comparable. Promotion: strictly-better eval.
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
while busy '^bash [^ ]*campaign2[234]\.sh|pbrl_tpu\.cli (train|eval|rollout|bench)|python bench\.py'; do
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

run_job 1500 logs/eval_jump_inc25.json python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/jump --num-envs 128 --steps 256
sleep 45
J_INC=$(ev logs/eval_jump_inc25.json)
echo "INCUMBENT jump=$J_INC"
python -c "import sys; sys.exit(0 if float('$J_INC') > 0 else 1)" || exit 1

JFLAGS=$(JAX_PLATFORMS=cpu python scripts/recipe_flags.py ckpts/jump)
echo "JFLAGS=$JFLAGS"

# ---- JD: drift_w 0.25 polish, incumbent sigma ----
rm -rf ckpts/jump_r4jd
cp -r ckpts/jump ckpts/jump_r4jd
run_job 3600 logs/jump_r4_armJD.log python -m pbrl_tpu.cli train --clip jump --num-envs 2048 --quiet $JFLAGS \
  --env-set drift_w=0.25 \
  --total-steps 300000000 --lr 5e-5 \
  --checkpoint-dir ckpts/jump_r4jd
sleep 45
run_job 1500 logs/eval_jump_jd.json python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/jump_r4jd --num-envs 128 --steps 256
sleep 45
JD=$(ev logs/eval_jump_jd.json)
echo "ARM_JD=$JD incumbent=$J_INC"
BEST=$J_INC
BESTDIR=ckpts/jump
if python -c "import sys; sys.exit(0 if float('$JD') > float('$J_INC') else 1)"; then
  BEST=$JD; BESTDIR=ckpts/jump_r4jd
fi

# ---- JE: drift_w 0.5 from the current best ----
rm -rf ckpts/jump_r4je
cp -r "$BESTDIR" ckpts/jump_r4je
run_job 3600 logs/jump_r4_armJE.log python -m pbrl_tpu.cli train --clip jump --num-envs 2048 --quiet $JFLAGS \
  --env-set drift_w=0.5 \
  --total-steps 300000000 --lr 5e-5 \
  --checkpoint-dir ckpts/jump_r4je
sleep 45
run_job 1500 logs/eval_jump_je.json python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/jump_r4je --num-envs 128 --steps 256
sleep 45
JE=$(ev logs/eval_jump_je.json)
echo "ARM_JE=$JE best_so_far=$BEST"
if python -c "import sys; sys.exit(0 if float('$JE') > float('$BEST') else 1)"; then
  BEST=$JE; BESTDIR=ckpts/jump_r4je
fi

if [ "$BESTDIR" != "ckpts/jump" ]; then
  echo "PROMOTE_JUMP=$BESTDIR eval=$BEST"
  rm -rf ckpts/jump && cp -r "$BESTDIR" ckpts/jump
  run_job 1800 logs/render_jump_r4.log python -m pbrl_tpu.cli rollout \
    --checkpoint-dir ckpts/jump --steps 240 \
    --out artifacts/jump.npz --video artifacts/jump.mp4 --camera back
  sleep 45
fi
# CPU transfer check on the final shipped jump (criterion guard)
timeout 5400 python scripts/reward_parity.py --checkpoint-dir ckpts/jump \
  --out /tmp/parity_jump25.md > logs/parity_jump25.json 2>&1 || true
echo CAMPAIGN25_DONE
