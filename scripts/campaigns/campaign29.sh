#!/bin/bash
# Campaign 29 — chained behind campaign 28. Control arm for the suspected
# trace-folding perf regression: run the PRE-folding bench (git worktree at
# d7c7f9c, the commit whose committed measurement is 4.32M env-steps/s) on
# TODAY'S chip, in the same session sequence as campaign 28's post-folding
# numbers. Interpretation matrix:
#   prefold ~4.3M, step/static2 ~3.6M  -> real code regression (folding or
#                                         self-contact plumbing); bisect.
#   prefold ~3.6M                      -> chip/tunnel conditions changed;
#                                         post-folding code is fine.
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
while busy '^bash [^ ]*campaign2[0-8]\.sh|pbrl_tpu\.cli (train|eval|rollout|bench)|python bench\.py|pytest tests/test_kernel_tpu'; do
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

for i in 1 2 3; do
  wait_chip
  (cd /tmp/bench_prefold && timeout 1200 env BENCH_CHIP_WAIT_S=300 BENCH_SKIP_PARITY=1 \
     JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python bench.py) \
     > /root/repo/logs/bench_r4_prefold.json 2>&1
  rc=$?
  if [ $rc -eq 0 ] && ! grep -q "Unable to initialize backend" /root/repo/logs/bench_r4_prefold.json; then
    break
  fi
  echo "RETRY attempt=$i rc=$rc"
  sleep 90
done
echo "BENCH_PREFOLD=$(grep -h '^{' /root/repo/logs/bench_r4_prefold.json | tail -1)"
echo CAMPAIGN29_DONE
