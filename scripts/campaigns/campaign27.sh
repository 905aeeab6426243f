#!/bin/bash
# Campaign 27 — chained behind campaign 26. Two jobs:
#   1. Re-run the on-TPU kernel CI with the CORRECT invocation.
#      Campaign 26 stage 1 failed with pytest rc=4: the test module's old
#      docstring advertised a `--runtpu` flag that never existed — the
#      real gate is PBRL_TEST_TPU=1 (tests/conftest.py pins the CPU
#      backend otherwise). VERDICT r3 task 6.
#   2. Punch contingency: if campaign 26's contact-DR fine-tune did NOT
#      promote (check its log), run a stronger arm — wider tc range,
#      friction randomization stages, higher RSI noise — same strict
#      multi-start transfer-improvement promotion gate.
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
while busy '^bash [^ ]*campaign2[0-6]\.sh|pbrl_tpu\.cli (train|eval|rollout|bench)|python bench\.py|pytest tests/test_kernel_tpu'; do
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

# ---- 1. on-TPU kernel CI, correct invocation ----
run_job 2400 logs/kernel_ci_r4.log env PBRL_TEST_TPU=1 python -m pytest tests/test_kernel_tpu.py -v
echo "KERNEL_CI rc=$? tail: $(tail -3 logs/kernel_ci_r4.log | tr '\n' ' ')"
sleep 45

# ---- 2. punch contingency ----
if grep -q "PROMOTE_punch" logs/campaign26_r4.log; then
  echo "punch already promoted by campaign 26; skipping contingency"
else
  skill=punch
  FLAGS=$(JAX_PLATFORMS=cpu python scripts/recipe_flags.py "ckpts/$skill")
  echo "FLAGS=$FLAGS"

  run_job 1500 "logs/eval_${skill}_inc27.json" python -m pbrl_tpu.cli eval \
    --checkpoint-dir "ckpts/$skill" --num-envs 128 --steps 256
  sleep 45
  EV_INC=$(jkey "logs/eval_${skill}_inc27.json" eval_reward)
  timeout 5400 python scripts/reward_parity.py --checkpoint-dir "ckpts/$skill" \
    --rollouts 4 --out "/tmp/parity_${skill}_inc27.md" > "logs/parity_${skill}_inc27.json" 2>&1
  GAP_INC=$(jkey "logs/parity_${skill}_inc27.json" relative_gap)
  echo "INCUMBENT $skill eval=$EV_INC gap=$GAP_INC"

  if python -c "import sys; sys.exit(0 if float('$EV_INC') > 0 and float('$GAP_INC') >= 0 else 1)"; then
    rm -rf "ckpts/${skill}_r4tr2"
    cp -r "ckpts/$skill" "ckpts/${skill}_r4tr2"
    # Stronger sequential DR than campaign 26: wider tc range, friction
    # stages, higher RSI noise, 200M per stage.
    stage=0
    for cfg in "0.6 1.0" "1.5 1.0" "1.0 0.8" "1.0 1.25" "1.0 1.0"; do
      set -- $cfg; tc=$1; fr=$2; stage=$((stage+1))
      run_job 3600 "logs/${skill}_r4tr2_s$stage.log" python -m pbrl_tpu.cli train \
        --clip "$skill" --num-envs 2048 --quiet $FLAGS \
        --env-set contact_tc_scale=$tc --env-set friction_scale=$fr \
        --env-set rsi_noise_qpos=0.05 --env-set rsi_noise_qvel=0.5 \
        --train-set entropy_cost=0 \
        --total-steps 200000000 --lr 1e-4 \
        --checkpoint-dir "ckpts/${skill}_r4tr2"
      sleep 45
    done

    run_job 1500 "logs/eval_${skill}_r4tr2.json" python -m pbrl_tpu.cli eval \
      --checkpoint-dir "ckpts/${skill}_r4tr2" --num-envs 128 --steps 256
    sleep 45
    EV_TR=$(jkey "logs/eval_${skill}_r4tr2.json" eval_reward)
    timeout 5400 python scripts/reward_parity.py --checkpoint-dir "ckpts/${skill}_r4tr2" \
      --rollouts 4 --out "/tmp/parity_${skill}_tr2.md" > "logs/parity_${skill}_tr2.json" 2>&1
    GAP_TR=$(jkey "logs/parity_${skill}_tr2.json" relative_gap)
    echo "ARM ${skill}_r4tr2 eval=$EV_TR gap=$GAP_TR (incumbent eval=$EV_INC gap=$GAP_INC)"

    if python -c "import sys; ok = float('$GAP_TR') >= 0 and float('$GAP_TR') < float('$GAP_INC') and float('$EV_TR') > float('$EV_INC') - 0.05; sys.exit(0 if ok else 1)"; then
      echo "PROMOTE_${skill}=${skill}_r4tr2 eval=$EV_TR gap=$GAP_TR"
      rm -rf "ckpts/$skill" && cp -r "ckpts/${skill}_r4tr2" "ckpts/$skill"
      run_job 1800 "logs/render_${skill}_tr2.log" python -m pbrl_tpu.cli rollout \
        --checkpoint-dir "ckpts/$skill" --steps 240 \
        --out "artifacts/$skill.npz" --video "artifacts/$skill.gif" --camera back
      sleep 45
    fi
  fi
fi
echo CAMPAIGN27_DONE
