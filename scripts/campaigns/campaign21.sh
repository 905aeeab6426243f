#!/bin/bash
# Campaign 21 — sigma-reset polish arms, chained strictly AFTER campaign 20.
#
# Rationale (docs/BACKFLIP_EXPERIMENTS.md): the recipe is pinned at the
# sigma-0.52 precision wall. Campaign-20 arm AH attacks it indirectly
# (entropy penalty -0.01); this campaign attacks it DIRECTLY: overwrite the
# restored log_std with -1.5 (sigma ~0.22, still learnable, hard-bounded at
# 0.1) and fine-tune at low LR. Distinct from round-2 arm M (fixed std 0.1,
# pre-drift-fix era when the obs dropped root x/y): the policy now has
# ref-root-offset observability and drift shaping, so precision training
# from a small sigma has gradient signal M never had. Jump sits at the same
# wall (logs/jump_r3c.log: dfa7e0c), so it gets the same arm.
#
# Wedge safety: this shell takes the chip ONLY after the campaign-20 process
# has fully exited (single serial chain at any moment, settle >=120 s).
# Log hygiene (VERDICT r3 weak #7): no set -x — the 60 s watchdog loops
# would trace thousands of no-op lines into the committed log. Decisions
# and results are echoed explicitly below.
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo

# ---- serialize behind campaign 20 ----
# Wait until (a) the campaign-20 shell itself is gone (found by scanning
# /proc cmdlines for campaign20.sh — /tmp/c20.pid records the launch
# wrapper, not the script), AND (b) no pbrl_tpu.cli chip job is running.
# Read-only scan; never kill by pattern.
c20_busy() {
  local p
  for p in /proc/[0-9]*/cmdline; do
    if tr '\0' ' ' < "$p" 2>/dev/null | grep -qE '^bash [^ ]*campaign20\.sh|pbrl_tpu\.cli (train|eval|rollout|bench)|python bench\.py'; then
      return 0
    fi
  done
  return 1
}
while c20_busy; do sleep 60; done
sleep 120

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

# Fresh incumbent evals (the shipped dirs may have been promoted by c20).
run_job 1500 logs/eval_bf_inc21.json python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/backflip --num-envs 128 --steps 256
sleep 45
run_job 1500 logs/eval_jump_inc21.json python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/jump --num-envs 128 --steps 256
sleep 45
BF_INC=$(ev logs/eval_bf_inc21.json)
J_INC=$(ev logs/eval_jump_inc21.json)
echo "INCUMBENTS backflip=$BF_INC jump=$J_INC"
# A parse failure yields -1, which would let ANY arm promote — refuse.
python -c "import sys; sys.exit(0 if float('$BF_INC') > 0 and float('$J_INC') > 0 else 1)" || exit 1

# ---- AJ2: backflip sigma-reset polish ----
BFFLAGS=$(JAX_PLATFORMS=cpu python scripts/recipe_flags.py ckpts/backflip)
rm -rf ckpts/backflip_r3aj2
cp -r ckpts/backflip ckpts/backflip_r3aj2
run_job 3600 logs/bf_r3_armAJ2.log python -m pbrl_tpu.cli train --clip backflip --num-envs 2048 --quiet $BFFLAGS \
  --train-set reset_log_std=True --train-set init_log_std=-1.5 \
  --train-set entropy_cost=0 \
  --total-steps 300000000 --lr 5e-5 \
  --checkpoint-dir ckpts/backflip_r3aj2
sleep 45
run_job 1500 logs/eval_bf_aj2.json python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/backflip_r3aj2 --num-envs 128 --steps 256
sleep 45
AJ2=$(ev logs/eval_bf_aj2.json)
echo "ARM_AJ2=$AJ2 incumbent=$BF_INC"
if python -c "import sys; sys.exit(0 if float('$AJ2') > float('$BF_INC') else 1)"; then
  echo "PROMOTE_BACKFLIP=backflip_r3aj2 eval=$AJ2"
  rm -rf ckpts/backflip && cp -r ckpts/backflip_r3aj2 ckpts/backflip
  run_job 1800 logs/render_bf_aj2.log python -m pbrl_tpu.cli rollout \
    --checkpoint-dir ckpts/backflip --steps 240 \
    --out artifacts/backflip.npz --video artifacts/backflip.mp4 --camera back
  sleep 45
fi

# ---- JS: jump sigma-reset polish ----
JFLAGS=$(JAX_PLATFORMS=cpu python scripts/recipe_flags.py ckpts/jump)
rm -rf ckpts/jump_r3js
cp -r ckpts/jump ckpts/jump_r3js
run_job 3600 logs/jump_r3js.log python -m pbrl_tpu.cli train --clip jump --num-envs 2048 --quiet $JFLAGS \
  --train-set reset_log_std=True --train-set init_log_std=-1.5 \
  --train-set entropy_cost=0 \
  --total-steps 300000000 --lr 5e-5 \
  --checkpoint-dir ckpts/jump_r3js
sleep 45
run_job 1500 logs/eval_jump_r3js.json python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/jump_r3js --num-envs 128 --steps 256
sleep 45
JS=$(ev logs/eval_jump_r3js.json)
echo "ARM_JS=$JS incumbent=$J_INC"
if python -c "import sys; sys.exit(0 if float('$JS') > float('$J_INC') else 1)"; then
  echo "PROMOTE_JUMP=jump_r3js eval=$JS"
  rm -rf ckpts/jump && cp -r ckpts/jump_r3js ckpts/jump
  run_job 1800 logs/render_jump_js.log python -m pbrl_tpu.cli rollout \
    --checkpoint-dir ckpts/jump --steps 240 \
    --out artifacts/jump.npz --video artifacts/jump.mp4 --camera back
  sleep 45
fi

# ---- closeout: CPU parity refresh over the (possibly re-promoted) set ----
python scripts/reward_parity.py > logs/parity_final21.json 2>&1
echo CAMPAIGN21_DONE
