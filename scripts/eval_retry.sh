#!/usr/bin/env bash
# One eval per chip job with wedge detection: the axon tunnel occasionally
# deadlocks a process that starts while the previous holder is releasing
# (symptom: ~10s CPU then a futex wait forever). Watchdog: if the job
# makes no CPU progress for 120s, kill and retry after a settle.
set -uo pipefail
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.jax_cache}"
for d in "$@"; do
  [ -d "$d" ] || continue
  name=$(basename "$d")
  for attempt in 1 2 3; do
    sleep 45
    python -m pbrl_tpu.cli eval --checkpoint-dir "$d" > /tmp/eval_one.json 2>/dev/null &
    pid=$!
    ok=""
    last_cpu=0; stall=0
    for i in $(seq 1 120); do   # up to 20 min
      sleep 10
      kill -0 $pid 2>/dev/null || { ok=done; break; }
      cpu=$(ps -o time= -p $pid | awk -F: '{print $1*3600+$2*60+$3}')
      if [ "${cpu:-0}" -le "$last_cpu" ]; then stall=$((stall+1)); else stall=0; fi
      last_cpu=${cpu:-0}
      if [ $stall -ge 12 ]; then  # 120s no CPU progress
        kill $pid 2>/dev/null; sleep 3; kill -9 $pid 2>/dev/null
        echo "$name: WEDGED (attempt $attempt)" >&2
        break
      fi
    done
    wait $pid 2>/dev/null
    if [ "$ok" = done ] && grep -q eval_reward /tmp/eval_one.json; then
      echo "$name: $(tail -1 /tmp/eval_one.json)"
      break
    fi
  done
done
