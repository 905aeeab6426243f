#!/bin/bash
# Campaign 19 — opportunistic skill polish after campaign 18.
# kick (0.742) and punch (0.823) never received the round-3 endgame levers
# that lifted backflip/jump: gamma 0.98 (value horizon ~50 steps) and
# torque_limit_scale 2.5. One 300M promote-if-better arm each.
set -x
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
until grep -q CAMPAIGN18_DONE logs/campaign18.log; do sleep 60; done
sleep 60

wait_chip() {
  local n=0
  until timeout 300 python -c "import jax; print(jax.numpy.ones(8).sum())" >/dev/null 2>&1; do
    n=$((n+1)); echo "chip probe failed ($n), waiting 120s"; sleep 120
  done
  sleep 15
}

run_job() {  # run_job <timeout_s> <logfile> <cmd...>
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

ev() {
python - "$1" <<'EOF'
import json, sys
try:
    last = [l for l in open(sys.argv[1]) if l.strip().startswith("{")][-1]
    print(json.loads(last)["eval_reward"])
except Exception:
    print(-1)
EOF
}

for skill in kick punch; do
  FLAGS=$(python scripts/recipe_flags.py "ckpts/$skill")
  echo "SKILL=$skill FLAGS=$FLAGS"
  rm -rf "ckpts/${skill}_r3g98"
  cp -r "ckpts/$skill" "ckpts/${skill}_r3g98"
  run_job 3600 "logs/${skill}_r3g98.log" python -m pbrl_tpu.cli train --clip "$skill" --num-envs 2048 --quiet $FLAGS \
    --train-set gamma=0.98 --train-set entropy_cost=0 \
    --env-set torque_limit_scale=2.5 \
    --total-steps 300000000 --lr 1e-4 \
    --checkpoint-dir "ckpts/${skill}_r3g98"
  sleep 45
  run_job 1500 "logs/eval_${skill}_r3g98.json" python -m pbrl_tpu.cli eval --checkpoint-dir "ckpts/${skill}_r3g98" --num-envs 128 --steps 256
  sleep 45
  new=$(ev "logs/eval_${skill}_r3g98.json")
  old=$(ev "logs/eval_${skill}_r3.json")
  echo "SKILL=$skill new=$new old=$old"
  if python -c "import sys; sys.exit(0 if float('$new') > float('$old') else 1)"; then
    echo "PROMOTE_${skill}=${skill}_r3g98"
    rm -rf "ckpts/$skill" && cp -r "ckpts/${skill}_r3g98" "ckpts/$skill"
    run_job 1800 "logs/render_${skill}_r3g98.log" python -m pbrl_tpu.cli rollout --checkpoint-dir "ckpts/$skill" --steps 240 \
      --out "artifacts/$skill.npz" --video "artifacts/$skill.mp4" --camera back
    sleep 45
  fi
done
echo CAMPAIGN19_DONE
