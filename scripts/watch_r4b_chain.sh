#!/bin/bash
# Round-4 follow-up on-chip chain: waits for the primary r4 chain
# (watch_r4_chain.sh) to finish, then runs
#   1. r4_token_merge_ab.py    — re-run after the attention-backward
#      VMEM live-window fix (the first run died at Mosaic compile) and
#      the closure->argument fix
#   2. local_attention_learning.py --task relational — positive control
#      (first texture run saturated all arms at 1.0)
#
# Usage: nohup bash scripts/watch_r4b_chain.sh > /tmp/r4b_chain.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

while [ -f /tmp/r4_chain.pid ] && kill -0 "$(cat /tmp/r4_chain.pid)" 2>/dev/null; do
  echo "waiting for primary r4 chain $(date)"
  sleep 120
done
echo "primary chain clear $(date)"

run() {
  name=$1; shift
  echo "=== $name start $(date)"
  timeout 14400 "$@" > "/tmp/r4b_${name}.log" 2>&1
  echo "=== $name exit=$? $(date)"
}

run token_merge python scripts/r4_token_merge_ab.py
run local_rel python scripts/local_attention_learning.py \
  --task relational --out results/local_attention_relational.json
echo "r4b chain DONE $(date)"
