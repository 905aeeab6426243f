#!/bin/bash
# Campaign 32 (round 5) — evidence refresh at HEAD, chained strictly behind
# campaign 31 (single-tenant chip; busy() scan serializes):
#   1. on-TPU kernel CI at the round-5 HEAD (the committed green log was
#      produced by campaign 27 on the round-4 code; field_physics changed
#      since — slide fix, fk_outputs _ensure_field) -> logs/kernel_ci_r5.log
#   2. 3-mode self-contact-mass bench A/B with the mode-correct FLOPs
#      plumbing (bench.py now builds the flops spec from env.model). The
#      round-5 first attempt used a 900 s timeout that expired mid-compile
#      (cold caches after the code edits, 1-CPU host) and wedged the
#      tunnel; 2400 s here.
#   3. full --runslow pytest suite at HEAD -> logs/pytest_runslow_r5.log
#      (VERDICT r4 next-#6). CPU-only, runs last.
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
while busy 'campaign31\.sh|pbrl_tpu\.cli (train|eval|rollout|bench)|python bench\.py|pytest tests/test_kernel_tpu|reward_parity'; do
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

# ---- 1. kernel CI at HEAD ------------------------------------------------
run_job 2400 logs/kernel_ci_r5.log env PBRL_TEST_TPU=1 python -m pytest tests/test_kernel_tpu.py -v
echo "KERNEL_CI rc=$? tail: $(tail -2 logs/kernel_ci_r5.log | tr '\n' ' ')"
sleep 60

# ---- 2. 3-mode bench A/B, mode-correct FLOPs -----------------------------
for mode in step substep static; do
  run_job 2400 "logs/bench_r5_$mode.json" env BENCH_CHIP_WAIT_S=1800 BENCH_SELF_MASS=$mode python bench.py
  echo "BENCH_$mode=$(grep -h '^{' logs/bench_r5_$mode.json | tail -1)"
  sleep 60
done

# ---- 3. full --runslow suite at HEAD (CPU) --------------------------------
JAX_PLATFORMS=cpu timeout 7200 python -m pytest tests/ -q --runslow \
  > logs/pytest_runslow_r5.log 2>&1
echo "RUNSLOW rc=$? tail: $(tail -1 logs/pytest_runslow_r5.log)"

git add -- logs/kernel_ci_r5.log logs/bench_r5_step.json logs/bench_r5_substep.json \
  logs/bench_r5_static.json logs/pytest_runslow_r5.log 2>/dev/null
git commit -m "Round-5 evidence refresh: at-HEAD kernel CI, 3-mode bench with mode-correct FLOPs, full --runslow suite" \
  -- logs/kernel_ci_r5.log logs/bench_r5_step.json logs/bench_r5_substep.json \
  logs/bench_r5_static.json logs/pytest_runslow_r5.log || echo "EVIDENCE_COMMIT_FAILED"
echo CAMPAIGN32_DONE
