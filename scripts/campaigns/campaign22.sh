#!/bin/bash
# Campaign 22 — kick/punch MuJoCo-transfer fine-tunes, chained strictly
# AFTER campaign 21.
#
# Why: the round-3 full-clip parity sweep (PARITY.md) found kick (38%) and
# punch (78%) transfer gaps that are SYSTEMATIC, not chaotic — 4
# identically-perturbed starts reproduce the oracle reward to +-0.002; the
# oracle rollout falls in the last third while ours balances. Same failure
# mode the backflip R-lineage had (14.2%) before contact-robust training
# fixed it. Recipe: the campaign-18 AJ treatment — sequential contact-domain
# randomization (contact_tc_scale 0.7 -> 1.4 -> 1.0, 150M each) + moderate
# RSI noise. Promotion is TRANSFER-gated: multi-start CPU parity gap must
# strictly improve AND eval must stay within 0.05 of the incumbent.
# Log hygiene (VERDICT r3 weak #7): no set -x — the 60 s watchdog loops
# would trace thousands of no-op lines into the committed log. Decisions
# and results are echoed explicitly below.
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
while busy '^bash [^ ]*campaign2[01]\.sh|pbrl_tpu\.cli (train|eval|rollout|bench)|python bench\.py'; do
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

for skill in kick punch; do
  FLAGS=$(JAX_PLATFORMS=cpu python scripts/recipe_flags.py "ckpts/$skill")
  echo "FLAGS=$FLAGS"

  # Incumbent baselines: eval (chip) + multi-start transfer gap (CPU).
  run_job 1500 "logs/eval_${skill}_inc22.json" python -m pbrl_tpu.cli eval \
    --checkpoint-dir "ckpts/$skill" --num-envs 128 --steps 256
  sleep 45
  EV_INC=$(jkey "logs/eval_${skill}_inc22.json" eval_reward)
  timeout 5400 python scripts/reward_parity.py --checkpoint-dir "ckpts/$skill" \
    --rollouts 4 --out "/tmp/parity_${skill}_inc22.md" > "logs/parity_${skill}_inc22.json" 2>&1
  GAP_INC=$(jkey "logs/parity_${skill}_inc22.json" relative_gap)
  echo "INCUMBENT $skill eval=$EV_INC gap=$GAP_INC"
  python -c "import sys; sys.exit(0 if float('$EV_INC') > 0 and float('$GAP_INC') >= 0 else 1)" || continue

  rm -rf "ckpts/${skill}_r3tr"
  cp -r "ckpts/$skill" "ckpts/${skill}_r3tr"
  for tc in 0.7 1.4 1.0; do
    run_job 3600 "logs/${skill}_r3tr_tc$tc.log" python -m pbrl_tpu.cli train \
      --clip "$skill" --num-envs 2048 --quiet $FLAGS \
      --env-set contact_tc_scale=$tc \
      --env-set rsi_noise_qpos=0.03 --env-set rsi_noise_qvel=0.3 \
      --train-set entropy_cost=0 \
      --total-steps 150000000 --lr 1e-4 \
      --checkpoint-dir "ckpts/${skill}_r3tr"
    sleep 45
  done

  run_job 1500 "logs/eval_${skill}_r3tr.json" python -m pbrl_tpu.cli eval \
    --checkpoint-dir "ckpts/${skill}_r3tr" --num-envs 128 --steps 256
  sleep 45
  EV_TR=$(jkey "logs/eval_${skill}_r3tr.json" eval_reward)
  timeout 5400 python scripts/reward_parity.py --checkpoint-dir "ckpts/${skill}_r3tr" \
    --rollouts 4 --out "/tmp/parity_${skill}_tr.md" > "logs/parity_${skill}_tr.json" 2>&1
  GAP_TR=$(jkey "logs/parity_${skill}_tr.json" relative_gap)
  echo "ARM ${skill}_r3tr eval=$EV_TR gap=$GAP_TR (incumbent eval=$EV_INC gap=$GAP_INC)"

  if python -c "import sys; ok = float('$GAP_TR') >= 0 and float('$GAP_TR') < float('$GAP_INC') and float('$EV_TR') > float('$EV_INC') - 0.05; sys.exit(0 if ok else 1)"; then
    echo "PROMOTE_${skill}=${skill}_r3tr eval=$EV_TR gap=$GAP_TR"
    rm -rf "ckpts/$skill" && cp -r "ckpts/${skill}_r3tr" "ckpts/$skill"
    run_job 1800 "logs/render_${skill}_tr.log" python -m pbrl_tpu.cli rollout \
      --checkpoint-dir "ckpts/$skill" --steps 240 \
      --out "artifacts/$skill.npz" --video "artifacts/$skill.mp4" --camera back
    sleep 45
  fi
done
echo CAMPAIGN22_DONE
