#!/bin/bash
# Round-5 closing validation: waits for the learning chains, then runs
# the on-chip hardware suite and the closing benches (now with the MFU
# line) so the round ends with fresh production-path evidence.
#
# Ordering is by explicit log markers, not pid files: the first
# version raced a chain restart window in which both pid files were
# momentarily absent and started benching against the studies.
#
# Usage: nohup bash scripts/watch_r5_close.sh > /tmp/r5_close_chain.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

until grep -q "r5 learning chain DONE" /tmp/r5_chain.log 2>/dev/null; do
  echo "waiting on main chain $(date)"
  sleep 300
done
until grep -q "stage D exit=" /tmp/r5_placement_depth8.log 2>/dev/null \
      || grep -q "stage D exit=" /tmp/r5_d8_chain.log 2>/dev/null; do
  echo "waiting on d8 stage $(date)"
  sleep 300
done
echo "chains clear $(date)"
echo $$ > /tmp/r5_close.pid

timeout 3600 python bench.py > /tmp/r5_bench_infer.log 2>&1
echo "bench infer exit=$? $(date)"
timeout 3600 python bench.py --train > /tmp/r5_bench_train.log 2>&1
echo "bench train exit=$? $(date)"

SFC_VIT_TPU_TESTS=1 timeout 3600 python -m pytest \
  tests/test_tpu_hardware.py -q > /tmp/r5_onchip_suite.log 2>&1
echo "on-chip suite exit=$? $(date)"

echo "r5 close DONE $(date)"
rm -f /tmp/r5_close.pid
