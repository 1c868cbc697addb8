#!/bin/bash
# Round-5 stage D: global-layer placement/count at depth 8 (VERDICT r4
# item 5 — "2 globals at depth 8").  Waits for the main r5 learning
# chain, then runs the depth-8 placement arms on relational-v2: one
# global first vs last, two globals, and a pure-local depth-8 control
# (receptive field doubles vs depth 4 — verify it still cannot reach
# across ~4k tokens).
#
# Usage: nohup bash scripts/watch_r5_depth8.sh > /tmp/r5_d8_chain.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

while [ -f /tmp/r5_learning.pid ] && kill -0 "$(cat /tmp/r5_learning.pid)" 2>/dev/null; do
  echo "waiting for r5 learning chain $(date)"
  sleep 300
done
echo "main chain clear $(date)"
echo $$ > /tmp/r5_d8.pid

timeout 14400 python scripts/local_attention_learning.py \
  --task relational-v2 --image-size 256 \
  --seeds 3 --epochs 16 --steps-per-epoch 128 --batch-size 8 \
  --impls local,local,local,local,local,local,local,xla \
          xla,local,local,local,local,local,local,local \
          local,local,local,xla,local,local,local,xla \
          local,local,local,local,local,local,local,local \
  --out results/r5_placement_depth8.json \
  > /tmp/r5_placement_depth8.log 2>&1
echo "stage D exit=$? $(date)"
rm -f /tmp/r5_d8.pid
