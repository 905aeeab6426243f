#!/usr/bin/env bash
# Render one policy rollout per trained skill (VERDICT r1 #8: committed
# rollout artifacts reproducing the reference notebooks' camera views).
# GIF fallback is automatic when no ffmpeg is present.
set -uo pipefail
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/.jax_cache}"
OUT="${OUT:-artifacts}"
mkdir -p "$OUT"
for skill in walk jump backflip kick punch getup getup_faceup; do
  dir="ckpts/$skill"
  [ -d "$dir" ] || { echo "skip $skill (no checkpoint)"; continue; }
  echo ">>> $skill"
  python -m pbrl_tpu.cli rollout --checkpoint-dir "$dir" --steps 240 \
    --out "$OUT/$skill.npz" --video "$OUT/$skill.mp4" --camera back \
    || echo "RENDER FAILED: $skill"
done
ls -la "$OUT"
