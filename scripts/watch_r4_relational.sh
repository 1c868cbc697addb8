#!/bin/bash
# Re-run the relational local-attention positive control after the
# round-4 closing chain frees the chip.  The first attempt crashed at
# the pallas arm's compile: the flash FORWARD chooser picked
# (block_q=512, block_k=4096) at fp32/dh=32 — 16.91 MiB scoped VMEM
# vs the 16 MiB limit.  Fixed by _fwd_block_q_cap (dtype-aware demotion
# to 256); this run validates the fix on the exact failing geometry AND
# closes VERDICT item 3's positive control.
#
# Usage: nohup bash scripts/watch_r4_relational.sh > /tmp/r4_rel.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

while [ -f /tmp/r4_close.pid ] && kill -0 "$(cat /tmp/r4_close.pid)" 2>/dev/null; do
  echo "waiting for r4 close chain $(date)"
  sleep 120
done
echo "close chain clear $(date)"

timeout 7200 python scripts/local_attention_learning.py \
  --task relational --out results/local_attention_relational.json \
  > /tmp/r4_relational.log 2>&1
echo "relational exit=$? $(date)"
