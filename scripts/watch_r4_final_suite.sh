#!/bin/bash
# Final round-4 validation: after the relational re-run frees the chip,
# re-run the on-chip hardware suite so the flash-forward VMEM cap
# (_fwd_block_q_cap, committed after the 14:37 suite pass) also has a
# hardware-suite data point.
#
# Usage: nohup bash scripts/watch_r4_final_suite.sh > /tmp/r4_final.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

while [ -f /tmp/r4_rel_watch.pid ] && kill -0 "$(cat /tmp/r4_rel_watch.pid)" 2>/dev/null; do
  echo "waiting for relational run $(date)"
  sleep 120
done
echo "relational clear $(date)"

SFC_VIT_TPU_TESTS=1 timeout 7200 python -m pytest \
  tests/test_tpu_hardware.py -q > /tmp/r4_final_suite.log 2>&1
echo "final on-chip suite exit=$? $(date)"
