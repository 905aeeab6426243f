#!/bin/bash
# After campaign7: refresh the two skills never touched since the Delassus
# contact switch — walk and getup (facedown). Eval first (documents the
# transfer drop, if any), then +300M fine-tune on the current dynamics,
# then re-eval. Same recipe as the kick/punch/getup_faceup refreshes
# (commit 7ef9dba): resume in place, entropy_cost=0, lr 1e-4.
set -x
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
until grep -q CAMPAIGN7_DONE logs/campaign7.log; do sleep 60; done
sleep 45

python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/walk --num-envs 128 --steps 300 > logs/eval_walk_r3pre.json 2>&1
sleep 45
python -m pbrl_tpu.cli train --clip walk --num-envs 2048 --total-steps 300000000 --lr 1e-4 \
  --train-set entropy_cost=0 --quiet \
  --checkpoint-dir ckpts/walk > logs/walk_r3ft.log 2>&1
sleep 45
python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/walk --num-envs 128 --steps 300 > logs/eval_walk_r3.json 2>&1
sleep 45

python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/getup --num-envs 128 --steps 256 > logs/eval_getup_r3pre.json 2>&1
sleep 45
python -m pbrl_tpu.cli train --clip getup_facedown --num-envs 2048 --total-steps 300000000 --lr 1e-4 \
  --action-mode residual --no-joint-limits --no-early-termination \
  --train-set entropy_cost=0 --quiet \
  --checkpoint-dir ckpts/getup > logs/getup_r3ft.log 2>&1
sleep 45
python -m pbrl_tpu.cli eval --checkpoint-dir ckpts/getup --num-envs 128 --steps 256 > logs/eval_getup_r3.json 2>&1
echo CAMPAIGN8_DONE
