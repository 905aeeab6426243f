#!/bin/bash
# Campaign 33 (round 5) — backflip designed arm BB: closed-loop stiffness.
#
# Arm BA (campaign 31, feedforward lead) was falsified by TWO independent
# measurements: the zero-training lead sweep is monotone NEGATIVE
# (0 / 8.3 / 16.7 ms -> 0.4796 / 0.4652 / 0.4444) and direct
# cross-correlation of the shipped rollout against the reference shows NO
# positive temporal lag (best alignment at -44 ms with a nearly flat SSE
# landscape — the policy anticipates slightly, as its built-in t+dt target
# implies). The residual eval loss is SPATIAL looseness, not timing.
#
# The direct spatial-precision lever never tried in 30+ arms: PD gain
# scaling (arm X scaled torque LIMITS only; the kp/kd tables were fixed
# since round 1). Stable-PD is implicit in the integrator, so large kp
# stays stable; tracking bandwidth grows ~sqrt(kp). kd scales ~sqrt(kp) to
# keep the damping ratio. EnvConfig.kp_scale/kd_scale (round-5 commit).
#
# Stage A: zero-training eval sweep on the frozen incumbent — in residual
# mode the base target IS the reference pose, so a stiffer plant tracks it
# harder immediately; the policy's learned residuals may mismatch, so like
# campaign 31 the sweep gates, not decides. Stage B fine-tunes at the best
# scale on a +0.005 signal. Promotion is transfer-gated and atomic.
# Settlement: if BB also fails, the bar is re-anchored per
# docs/BACKFLIP_EXPERIMENTS.md round-5 settlement rule (manual step).
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
while busy 'campaign3[12]\.sh|pbrl_tpu\.cli (train|eval|rollout|bench)|python bench\.py|pytest tests/test_kernel_tpu|reward_parity'; do
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

jkey() {  # jkey <file> <key>
python - "$1" "$2" <<'EOF'
import json, sys
try:
    last = [l for l in open(sys.argv[1]) if l.strip().startswith("{")][-1]
    print(json.loads(last)[sys.argv[2]])
except Exception:
    print(-1)
EOF
}

# Control: incumbent eval is deterministic and already measured this
# session by campaign 31 (lead=0 -> 0.4796271026134491, bit-identical to
# the AK promotion eval).
EV0=0.4796271026134491

# ---- stage A: zero-training stiffness sweep ------------------------------
BEST_EV=-1; BEST_KP=1.0; BEST_KD=1.0
for pair in "1.25 1.118" "1.5 1.225" "2.0 1.414"; do
  set -- $pair; kp=$1; kd=$2
  tag=${kp/./}
  run_job 1500 "logs/eval_bf_kp${tag}.json" python -m pbrl_tpu.cli eval \
    --checkpoint-dir ckpts/backflip --num-envs 128 --steps 256 \
    --env-set kp_scale=$kp --env-set kd_scale=$kd
  EV=$(jkey "logs/eval_bf_kp${tag}.json" eval_reward)
  echo "KP_SWEEP kp=$kp kd=$kd eval=$EV"
  sleep 45
  if python -c "import sys; sys.exit(0 if float('$EV') > float('$BEST_EV') else 1)"; then
    BEST_EV=$EV; BEST_KP=$kp; BEST_KD=$kd
  fi
done
echo "KP_SWEEP_BEST kp=$BEST_KP kd=$BEST_KD eval=$BEST_EV control=$EV0"

# ---- stage B: fine-tune at the best scale (only on signal) ---------------
if python -c "import sys; sys.exit(0 if float('$BEST_EV') > float('$EV0') + 0.005 else 1)"; then
  FLAGS=$(JAX_PLATFORMS=cpu python scripts/recipe_flags.py ckpts/backflip)
  echo "ARM_BB kp=$BEST_KP kd=$BEST_KD FLAGS=$FLAGS"
  rm -rf ckpts/backflip_r5bb
  cp -r ckpts/backflip ckpts/backflip_r5bb
  run_job 5400 logs/backflip_r5bb.log python -m pbrl_tpu.cli train \
    --clip backflip --num-envs 2048 --quiet $FLAGS \
    --env-set kp_scale=$BEST_KP --env-set kd_scale=$BEST_KD \
    --total-steps 300000000 --lr 1e-4 \
    --checkpoint-dir ckpts/backflip_r5bb
  sleep 45
  run_job 1500 logs/eval_bf_r5bb.json python -m pbrl_tpu.cli eval \
    --checkpoint-dir ckpts/backflip_r5bb --num-envs 128 --steps 256
  EV_BB=$(jkey logs/eval_bf_r5bb.json eval_reward)
  sleep 45
  timeout 7200 python scripts/reward_parity.py --checkpoint-dir ckpts/backflip_r5bb \
    --rollouts 4 --out /tmp/parity_backflip_r5bb.md \
    > logs/parity_backflip_r5bb.json 2>&1
  GAP_BB=$(jkey logs/parity_backflip_r5bb.json relative_gap)
  echo "ARM_BB eval=$EV_BB gap=$GAP_BB (sweep-best=$BEST_EV control=$EV0)"

  if python -c "import sys; ok = float('$EV_BB') > float('$EV0') and 0 <= float('$GAP_BB') < 0.10; sys.exit(0 if ok else 1)"; then
    echo "PROMOTE_BACKFLIP=ckpts/backflip_r5bb eval=$EV_BB gap=$GAP_BB"
    rm -rf ckpts/backflip && cp -r ckpts/backflip_r5bb ckpts/backflip
    run_job 1800 logs/render_bf_r5.log python -m pbrl_tpu.cli rollout \
      --checkpoint-dir ckpts/backflip --steps 240 \
      --out artifacts/backflip.npz --video artifacts/backflip.gif --camera back
    sleep 45
    git commit -m "Promote backflip stiffness arm BB (eval $EV_BB, transfer gap $GAP_BB, kp x$BEST_KP kd x$BEST_KD)" \
      -- ckpts/backflip ckpts/backflip_r5bb artifacts/backflip.npz artifacts/backflip.gif \
      logs/eval_bf_r5bb.json logs/parity_backflip_r5bb.json logs/backflip_r5bb.log \
      logs/eval_bf_kp125.json logs/eval_bf_kp15.json logs/eval_bf_kp20.json \
      || echo "PROMOTE_COMMIT_FAILED"
  else
    echo "ARM_BB_REJECTED eval=$EV_BB gap=$GAP_BB"
  fi
else
  echo "NO_KP_SIGNAL best=$BEST_EV control=$EV0 — stage B skipped"
fi
echo CAMPAIGN33_DONE
