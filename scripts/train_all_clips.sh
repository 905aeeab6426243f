#!/usr/bin/env bash
# Train imitation policies for every bundled DeepMimic clip on the local
# TPU chip. Ballistic / floor-contact clips get the configuration their
# converted poses require (see README + EnvConfig docstrings).
set -euo pipefail
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.jax_cache}"

STEPS="${STEPS:-100000000}"
ENVS="${ENVS:-2048}"
OUT="${OUT:-ckpts}"

run() { echo ">>> $*"; python -m pbrl_tpu.cli "$@"; }

# upright, within joint limits: plain absolute-target training
for clip in walk jump; do
  run train --clip "$clip" --num-envs "$ENVS" --total-steps "$STEPS" \
      --checkpoint-dir "$OUT/$clip" --quiet
done

# clips whose poses exceed the model's hinge ranges: residual prior, no limits
for clip in backflip kick punch; do
  run train --clip "$clip" --num-envs "$ENVS" --total-steps "$STEPS" \
      --action-mode residual --no-joint-limits \
      --checkpoint-dir "$OUT/$clip" --quiet
done

# floor-contact clips: ground touches are part of the motion
for clip in getup_facedown getup_faceup; do
  run train --clip "$clip" --num-envs "$ENVS" --total-steps "$STEPS" \
      --action-mode residual --no-joint-limits --no-early-termination \
      --checkpoint-dir "$OUT/$clip" --quiet
done
