#!/bin/bash
# Campaign 31 (round 5) — backflip: close the two open VERDICT items with
# ONE designed mechanism, then settle the bar.
#
#   1. At-HEAD backflip parity under the multi-rollout protocol (VERDICT
#      r4 missing #4): the 7.8% row predates the self-contact-Delassus
#      default, and the campaign-26 single-rollout probe of the newly
#      promoted AK checkpoint read 28.9% — chaotic-clip single rollouts
#      are exactly what the rollouts>1 protocol exists for.
#   2. The designed arm (VERDICT r4 next-#4: "attack timing directly"):
#      ref_target_lead — feedforward lead on the residual PD base target,
#      sized from the measured ~25-30 ms realization lag
#      (logs/backflip_ceiling.json timing envelope). Stage A is a
#      ZERO-TRAINING eval sweep of the lead on the frozen incumbent (if
#      the lag is systematic, pure lead shifts reward immediately);
#      stage B fine-tunes at the best lead only if stage A shows signal.
#   3. Promotion is transfer-gated (eval must not regress AND 4-rollout
#      parity < 10%) and ATOMIC: ckpt + artifacts + logs land in one git
#      commit (VERDICT r4 next-#8) via `git commit -- <paths>`, which
#      ignores unrelated staged state.
#
# Serialized behind the round-5 3-mode bench via the busy() scan.
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
while busy 'bash /tmp/bench3_r5\.sh|^bash [^ ]*campaign(2[0-9]|30)\.sh|pbrl_tpu\.cli (train|eval|rollout|bench)|python bench\.py|pytest tests/test_kernel_tpu'; do
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

# ---- 1. incumbent at-HEAD parity, multi-rollout protocol (CPU) ----------
timeout 7200 python scripts/reward_parity.py --checkpoint-dir ckpts/backflip \
  --rollouts 4 --out /tmp/parity_backflip_r5inc.md \
  > logs/parity_backflip_r5inc.json 2>&1
GAP_INC=$(jkey logs/parity_backflip_r5inc.json relative_gap)
echo "INCUMBENT_PARITY gap=$GAP_INC ($(grep -h '^{' logs/parity_backflip_r5inc.json | tail -1))"

# ---- 2A. zero-training ref_target_lead eval sweep on the incumbent ------
# lead=0 control re-measured in the SAME session for comparability.
BEST_LEAD=0; BEST_EV=-1; EV0=-1
for lead in 0 0.0083 0.0167 0.025 0.0333; do
  tag=${lead/0./}
  run_job 1500 "logs/eval_bf_lead${tag}.json" python -m pbrl_tpu.cli eval \
    --checkpoint-dir ckpts/backflip --num-envs 128 --steps 256 \
    --env-set ref_target_lead=$lead
  EV=$(jkey "logs/eval_bf_lead${tag}.json" eval_reward)
  echo "LEAD_SWEEP lead=$lead eval=$EV"
  sleep 45
  if [ "$lead" = "0" ]; then EV0=$EV; fi
  if python -c "import sys; sys.exit(0 if float('$EV') > float('$BEST_EV') else 1)"; then
    BEST_EV=$EV; BEST_LEAD=$lead
  fi
done
echo "LEAD_SWEEP_BEST lead=$BEST_LEAD eval=$BEST_EV control=$EV0"

# ---- 2B. fine-tune at the best lead (only on signal) ---------------------
# Signal bar: +0.005 over the same-session control (incumbent noise band
# is ~±0.004 across campaign-21/26 arms).
if python -c "import sys; sys.exit(0 if float('$BEST_EV') > float('$EV0') + 0.005 and float('$BEST_LEAD') > 0 else 1)"; then
  FLAGS=$(JAX_PLATFORMS=cpu python scripts/recipe_flags.py ckpts/backflip)
  echo "ARM_BA lead=$BEST_LEAD FLAGS=$FLAGS"
  rm -rf ckpts/backflip_r5ba
  cp -r ckpts/backflip ckpts/backflip_r5ba
  run_job 5400 logs/backflip_r5ba.log python -m pbrl_tpu.cli train \
    --clip backflip --num-envs 2048 --quiet $FLAGS \
    --env-set ref_target_lead=$BEST_LEAD \
    --total-steps 300000000 --lr 1e-4 \
    --checkpoint-dir ckpts/backflip_r5ba
  sleep 45
  run_job 1500 logs/eval_bf_r5ba.json python -m pbrl_tpu.cli eval \
    --checkpoint-dir ckpts/backflip_r5ba --num-envs 128 --steps 256
  EV_BA=$(jkey logs/eval_bf_r5ba.json eval_reward)
  sleep 45
  timeout 7200 python scripts/reward_parity.py --checkpoint-dir ckpts/backflip_r5ba \
    --rollouts 4 --out /tmp/parity_backflip_r5ba.md \
    > logs/parity_backflip_r5ba.json 2>&1
  GAP_BA=$(jkey logs/parity_backflip_r5ba.json relative_gap)
  echo "ARM_BA eval=$EV_BA gap=$GAP_BA (sweep-best=$BEST_EV incumbent-gap=$GAP_INC)"

  # Transfer-gated promotion: eval must beat the incumbent's same-session
  # control AND parity must satisfy the north-star criterion.
  if python -c "import sys; ok = float('$EV_BA') > float('$EV0') and 0 <= float('$GAP_BA') < 0.10; sys.exit(0 if ok else 1)"; then
    echo "PROMOTE_BACKFLIP=ckpts/backflip_r5ba eval=$EV_BA gap=$GAP_BA"
    rm -rf ckpts/backflip && cp -r ckpts/backflip_r5ba ckpts/backflip
    run_job 1800 logs/render_bf_r5.log python -m pbrl_tpu.cli rollout \
      --checkpoint-dir ckpts/backflip --steps 240 \
      --out artifacts/backflip.npz --video artifacts/backflip.gif --camera back
    sleep 45
    # Atomic promotion (VERDICT r4 #8): ckpt + artifacts + evidence in ONE
    # commit; explicit pathspec so unrelated staged work is untouched.
    git add -- ckpts/backflip artifacts/backflip.npz artifacts/backflip.gif \
      logs/eval_bf_r5ba.json logs/parity_backflip_r5ba.json \
      logs/parity_backflip_r5inc.json logs/backflip_r5ba.log \
      logs/eval_bf_lead*.json logs/campaign31_r5.log 2>/dev/null
    git commit -m "Promote backflip ref-target-lead arm BA (eval $EV_BA, transfer gap $GAP_BA, lead $BEST_LEAD s)" \
      -- ckpts/backflip ckpts/backflip_r5ba artifacts/backflip.npz artifacts/backflip.gif \
      logs/eval_bf_r5ba.json logs/parity_backflip_r5ba.json \
      logs/parity_backflip_r5inc.json logs/backflip_r5ba.log logs/eval_bf_lead0083.json \
      logs/eval_bf_lead0167.json logs/eval_bf_lead025.json logs/eval_bf_lead0333.json \
      logs/eval_bf_lead0.json || echo "PROMOTE_COMMIT_FAILED"
  else
    echo "ARM_BA_REJECTED eval=$EV_BA gap=$GAP_BA"
  fi
else
  echo "NO_LEAD_SIGNAL best=$BEST_EV control=$EV0 — stage B skipped"
fi
echo CAMPAIGN31_DONE
