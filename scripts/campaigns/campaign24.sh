#!/bin/bash
# Campaign 24 — round-4 evidence chores, chained strictly AFTER campaign 23:
#   1. bench.py in the default 'step' self-contact-mass mode (the round-4
#      headline: exact-held self-contact masses, fewer ops than round 3);
#   2. A/B benches: 'substep' (full 500 Hz exactness) and 'static'
#      (round-2/3 surrogate) so the fidelity/throughput trade is measured,
#      not argued;
#   3. the on-TPU kernel CI (pytest tests/test_kernel_tpu.py --runtpu) —
#      VERDICT r3 task 6: it has never appeared in a committed log.
# Log hygiene: no set -x.
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo

busy() {
  local pat=$1 p
  for p in /proc/[0-9]*/cmdline; do
    if tr '\0' ' ' < "$p" 2>/dev/null | grep -qE "$pat"; then
      return 0
    fi
  done
  return 1
}
while busy '^bash [^ ]*campaign2[0123]\.sh|pbrl_tpu\.cli (train|eval|rollout|bench)|python bench\.py'; do
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

run_job 1200 logs/bench_r4_step.json env BENCH_CHIP_WAIT_S=300 python bench.py
sleep 45
run_job 1200 logs/bench_r4_substep.json env BENCH_CHIP_WAIT_S=300 BENCH_SELF_MASS=substep BENCH_SKIP_PARITY=1 python bench.py
sleep 45
run_job 1200 logs/bench_r4_static.json env BENCH_CHIP_WAIT_S=300 BENCH_SELF_MASS=static BENCH_SKIP_PARITY=1 python bench.py
sleep 45
run_job 2400 logs/kernel_ci_r4.log python -m pytest tests/test_kernel_tpu.py --runtpu -v
sleep 45
echo "BENCH_STEP=$(grep -h '^{' logs/bench_r4_step.json | tail -1)"
echo "BENCH_SUBSTEP=$(grep -h '^{' logs/bench_r4_substep.json | tail -1)"
echo "BENCH_STATIC=$(grep -h '^{' logs/bench_r4_static.json | tail -1)"
echo CAMPAIGN24_DONE
