#!/bin/bash
# Round-4 closing validation: after the r4b follow-up chain finishes,
# re-confirm the production paths on hardware (the backward block_b
# choosers were refactored this round):
#   1. bench.py --train   — ViT-B/16 train throughput (expect ~1,19x)
#   2. bench.py           — headline inference
#   3. SFC_VIT_TPU_TESTS=1 pytest tests/test_tpu_hardware.py
#
# Usage: nohup bash scripts/watch_r4_close.sh > /tmp/r4_close.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

while [ -f /tmp/r4b_chain.pid ] && kill -0 "$(cat /tmp/r4b_chain.pid)" 2>/dev/null; do
  echo "waiting for r4b chain $(date)"
  sleep 120
done
echo "r4b chain clear $(date)"

timeout 5400 python bench.py --train > /tmp/r4_close_train.log 2>&1
echo "bench --train exit=$? $(date)"
timeout 5400 python bench.py > /tmp/r4_close_infer.log 2>&1
echo "bench exit=$? $(date)"
SFC_VIT_TPU_TESTS=1 timeout 7200 python -m pytest \
  tests/test_tpu_hardware.py -q > /tmp/r4_close_suite.log 2>&1
echo "on-chip suite exit=$? $(date)"
echo "r4 close DONE $(date)"
