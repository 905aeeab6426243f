#!/bin/bash
# Campaign 28 — chained behind campaign 27. Benchmark the CURRENT kernel.
#
# The committed headline (logs/bench_r4_delassus.json, 4.32M env-steps/s)
# was captured at d7c7f9c — BEFORE the self-contact Delassus, trace-time
# folding, and reciprocal-diagonal commits. Campaign 26's static-mode A/B
# point (logs/bench_r4_static.json) measured 3.64M on the post-folding
# code — 16% below the pre-folding number for the same physics class —
# so the current default has never been measured. Capture all three
# self-contact-mass modes back-to-back in one chip session so the points
# are comparable (same thermal/tunnel conditions):
#   step    = held exact Delassus at policy-step cadence (DEFAULT)
#   substep = exact every physics substep
#   static  = round-2/3 harmonic surrogate
# The 'step' run keeps the kernel-vs-XLA parity assert (evidence); the
# A/B runs skip it to save chip time.
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
while busy '^bash [^ ]*campaign2[0-7]\.sh|pbrl_tpu\.cli (train|eval|rollout|bench)|python bench\.py|pytest tests/test_kernel_tpu'; do
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

run_job 1500 logs/bench_r4_step.json env BENCH_CHIP_WAIT_S=300 BENCH_SELF_MASS=step python bench.py
echo "BENCH_STEP=$(grep -h '^{' logs/bench_r4_step.json | tail -1)"
sleep 45
run_job 1200 logs/bench_r4_substep.json env BENCH_CHIP_WAIT_S=300 BENCH_SELF_MASS=substep BENCH_SKIP_PARITY=1 python bench.py
echo "BENCH_SUBSTEP=$(grep -h '^{' logs/bench_r4_substep.json | tail -1)"
sleep 45
run_job 1200 logs/bench_r4_static2.json env BENCH_CHIP_WAIT_S=300 BENCH_SELF_MASS=static BENCH_SKIP_PARITY=1 python bench.py
echo "BENCH_STATIC2=$(grep -h '^{' logs/bench_r4_static2.json | tail -1)"
echo CAMPAIGN28_DONE
