#!/usr/bin/env bash
# Evaluate every trained checkpoint with the standard DeepMimic reward.
# One chip job at a time; prints one JSON line per skill.
set -uo pipefail
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.jax_cache}"
for d in "$@"; do
  [ -d "$d" ] || continue
  sleep 20  # let the single-tenant chip fully release between jobs
  echo -n "$(basename "$d"): "
  python -m pbrl_tpu.cli eval --checkpoint-dir "$d" 2>/dev/null | tail -1
done
