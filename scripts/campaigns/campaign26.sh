#!/bin/bash
# Campaign 26 — consolidated re-run of the round-4 work that died at a
# session handoff (campaigns 22/23 never reached the chip; campaign 24 was
# killed mid static-bench, before the kernel CI). One serial process, so no
# cross-script chip races:
#   1. on-TPU kernel CI (pytest --runtpu) with the on-chip-calibrated
#      airborne tolerances (commit 349aa4c) — VERDICT r3 task 6;
#   2. the missing 'static' self-contact-mass A/B bench point;
#   3. campaign-22 body: kick/punch contact-DR transfer fine-tunes,
#      promotion gated on strict multi-start transfer improvement
#      (VERDICT r3 task 2);
#   4. campaign-23 body: backflip drift-attack polish arms AK/AL
#      (VERDICT r3 task 3).
# Log hygiene: no set -x; decisions echoed explicitly.
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
while busy '^bash [^ ]*campaign2[0-5]\.sh|pbrl_tpu\.cli (train|eval|rollout|bench)|python bench\.py|pytest tests/test_kernel_tpu'; do
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

# ---- 1. on-TPU kernel CI ----
run_job 2400 logs/kernel_ci_r4.log python -m pytest tests/test_kernel_tpu.py --runtpu -v
echo "KERNEL_CI rc=$? tail: $(tail -2 logs/kernel_ci_r4.log | tr '\n' ' ')"
sleep 45

# ---- 2. missing static-mode A/B bench point ----
run_job 1200 logs/bench_r4_static.json env BENCH_CHIP_WAIT_S=300 BENCH_SELF_MASS=static BENCH_SKIP_PARITY=1 python bench.py
sleep 45
echo "BENCH_STATIC=$(grep -h '^{' logs/bench_r4_static.json | tail -1)"

# ---- 3. kick/punch contact-DR transfer fine-tunes (campaign-22 body) ----
for skill in kick punch; do
  FLAGS=$(JAX_PLATFORMS=cpu python scripts/recipe_flags.py "ckpts/$skill")
  echo "FLAGS=$FLAGS"

  run_job 1500 "logs/eval_${skill}_inc22.json" python -m pbrl_tpu.cli eval \
    --checkpoint-dir "ckpts/$skill" --num-envs 128 --steps 256
  sleep 45
  EV_INC=$(jkey "logs/eval_${skill}_inc22.json" eval_reward)
  timeout 5400 python scripts/reward_parity.py --checkpoint-dir "ckpts/$skill" \
    --rollouts 4 --out "/tmp/parity_${skill}_inc22.md" > "logs/parity_${skill}_inc22.json" 2>&1
  GAP_INC=$(jkey "logs/parity_${skill}_inc22.json" relative_gap)
  echo "INCUMBENT $skill eval=$EV_INC gap=$GAP_INC"
  python -c "import sys; sys.exit(0 if float('$EV_INC') > 0 and float('$GAP_INC') >= 0 else 1)" || continue

  rm -rf "ckpts/${skill}_r4tr"
  cp -r "ckpts/$skill" "ckpts/${skill}_r4tr"
  for tc in 0.7 1.4 1.0; do
    run_job 3600 "logs/${skill}_r4tr_tc$tc.log" python -m pbrl_tpu.cli train \
      --clip "$skill" --num-envs 2048 --quiet $FLAGS \
      --env-set contact_tc_scale=$tc \
      --env-set rsi_noise_qpos=0.03 --env-set rsi_noise_qvel=0.3 \
      --train-set entropy_cost=0 \
      --total-steps 150000000 --lr 1e-4 \
      --checkpoint-dir "ckpts/${skill}_r4tr"
    sleep 45
  done

  run_job 1500 "logs/eval_${skill}_r4tr.json" python -m pbrl_tpu.cli eval \
    --checkpoint-dir "ckpts/${skill}_r4tr" --num-envs 128 --steps 256
  sleep 45
  EV_TR=$(jkey "logs/eval_${skill}_r4tr.json" eval_reward)
  timeout 5400 python scripts/reward_parity.py --checkpoint-dir "ckpts/${skill}_r4tr" \
    --rollouts 4 --out "/tmp/parity_${skill}_tr.md" > "logs/parity_${skill}_tr.json" 2>&1
  GAP_TR=$(jkey "logs/parity_${skill}_tr.json" relative_gap)
  echo "ARM ${skill}_r4tr eval=$EV_TR gap=$GAP_TR (incumbent eval=$EV_INC gap=$GAP_INC)"

  if python -c "import sys; ok = float('$GAP_TR') >= 0 and float('$GAP_TR') < float('$GAP_INC') and float('$EV_TR') > float('$EV_INC') - 0.05; sys.exit(0 if ok else 1)"; then
    echo "PROMOTE_${skill}=${skill}_r4tr eval=$EV_TR gap=$GAP_TR"
    rm -rf "ckpts/$skill" && cp -r "ckpts/${skill}_r4tr" "ckpts/$skill"
    run_job 1800 "logs/render_${skill}_tr.log" python -m pbrl_tpu.cli rollout \
      --checkpoint-dir "ckpts/$skill" --steps 240 \
      --out "artifacts/$skill.npz" --video "artifacts/$skill.gif" --camera back
    sleep 45
  fi
done

# ---- 4. backflip drift-attack polish arms (campaign-23 body) ----
run_job 1500 logs/eval_bf_inc23.json python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/backflip --num-envs 128 --steps 256
sleep 45
BF_INC=$(jkey logs/eval_bf_inc23.json eval_reward)
echo "INCUMBENT backflip=$BF_INC"
if python -c "import sys; sys.exit(0 if float('$BF_INC') > 0 else 1)"; then
  BFFLAGS=$(JAX_PLATFORMS=cpu python scripts/recipe_flags.py ckpts/backflip)
  echo "BFFLAGS=$BFFLAGS"

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
  AK=$(jkey logs/eval_bf_ak.json eval_reward)
  echo "ARM_AK=$AK incumbent=$BF_INC"
  BEST=$BF_INC
  BESTDIR=ckpts/backflip
  if python -c "import sys; sys.exit(0 if float('$AK') > float('$BF_INC') else 1)"; then
    BEST=$AK; BESTDIR=ckpts/backflip_r4ak
  fi

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
  AL=$(jkey logs/eval_bf_al.json eval_reward)
  echo "ARM_AL=$AL best_so_far=$BEST"
  if python -c "import sys; sys.exit(0 if float('$AL') > float('$BEST') else 1)"; then
    BEST=$AL; BESTDIR=ckpts/backflip_r4al
  fi

  if [ "$BESTDIR" != "ckpts/backflip" ]; then
    echo "PROMOTE_BACKFLIP=$BESTDIR eval=$BEST"
    rm -rf ckpts/backflip && cp -r "$BESTDIR" ckpts/backflip
    run_job 1800 logs/render_bf_r4.log python -m pbrl_tpu.cli rollout \
      --checkpoint-dir ckpts/backflip --steps 240 \
      --out artifacts/backflip.npz --video artifacts/backflip.gif --camera back
    sleep 45
  fi
  timeout 5400 python scripts/reward_parity.py --checkpoint-dir ckpts/backflip \
    --out /tmp/parity_bf26.md > logs/parity_bf26.json 2>&1 || true
  echo "BF_FINAL_PARITY=$(grep -h '^{' logs/parity_bf26.json | tail -1)"
fi
echo CAMPAIGN26_DONE
