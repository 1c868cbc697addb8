#!/bin/bash
# Round-5 true closing chain: depth-8 placement sweep (the remaining
# half of VERDICT r4 item 5 — "2 globals at depth 8"), then the
# on-chip hardware suite.  The in-round bench.py runs were dropped:
# the driver runs bench.py itself at round end (BENCH_r05.json), so
# repeating it here would only burn the chip time the depth-8 sweep
# needs.  Epochs trimmed 16 -> 10 (relational-v2 resolves global
# arms at epoch 1; local pinning is visible well inside 10).
#
# Usage: nohup bash scripts/watch_r5_close2.sh > /tmp/r5_close2.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
echo $$ > /tmp/r5_close2.pid

probe() {
  timeout 900 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
d = jax.devices()
assert d and d[0].platform != "cpu", d
x = jnp.ones((8, 8))
assert float((x @ x).sum()) == 512.0
EOF
}

wait_backend() {
  while ! probe; do
    echo "backend down $(date)"
    sleep 180
  done
  echo "backend UP $(date)"
}

commit_artifact() {
  local f=$1 msg=$2
  [ -s "$f" ] || return 1
  for i in 1 2 3; do
    git add "$f" && git commit -m "$msg" && return 0
    sleep 20
  done
  return 1
}

D_STOP=$(( $(date +%s) + 3900 ))   # leave ~35+ min for the suite
prev=""
last_dest=""
for attempt in 1 2 3; do
  [ "$(date +%s)" -gt "$D_STOP" ] && break
  dest=results/r5_placement_depth8.json
  [ $attempt -gt 1 ] && dest=results/r5_placement_depth8.try$attempt.json
  resume=()
  [ -n "$prev" ] && [ -s "$prev" ] && resume=(--resume-from "$prev")
  wait_backend
  echo "stage D attempt $attempt -> $dest $(date)"
  python scripts/local_attention_learning.py \
    --task relational-v2 --image-size 256 \
    --seeds 3 --epochs 10 --steps-per-epoch 128 --batch-size 8 \
    --steps-per-call 32 \
    --impls local,local,local,local,local,local,local,xla \
            xla,local,local,local,local,local,local,local \
            local,local,local,xla,local,local,local,xla \
            local,local,local,local,local,local,local,local \
    "${resume[@]}" \
    --out "$dest" > /tmp/r5_placement_depth8.log 2>&1 &
  pid=$!
  while kill -0 $pid 2>/dev/null; do
    sleep 60
    now=$(date +%s)
    mt=$(stat -c %Y /tmp/r5_placement_depth8.log 2>/dev/null || echo "$now")
    if [ $(( now - mt )) -gt 1200 ]; then
      echo "stage D attempt $attempt STALLED, killing $(date)"
      kill $pid 2>/dev/null; sleep 5; kill -9 $pid 2>/dev/null
      break
    fi
    if [ "$now" -gt "$D_STOP" ]; then
      echo "stage D attempt $attempt WALL-STOP, killing $(date)"
      kill $pid 2>/dev/null; sleep 5; kill -9 $pid 2>/dev/null
      break
    fi
  done
  wait $pid 2>/dev/null; rc=$?
  echo "stage D attempt $attempt exit=$rc $(date)"
  [ -s "$dest" ] && last_dest=$dest
  prev=$dest
  [ $rc -eq 0 ] && break
done
if [ -n "$last_dest" ]; then
  commit_artifact "$last_dest" \
    "results: depth-8 global-layer placement sweep ($(basename "$last_dest"))"
fi

# --- on-chip hardware suite ----------------------------------------
wait_backend
SFC_VIT_TPU_TESTS=1 timeout 4500 python -m pytest \
  tests/test_tpu_hardware.py -q > /tmp/r5_onchip_suite.log 2>&1
echo "on-chip suite exit=$? $(date)"

echo "r5 close2 DONE $(date)"
rm -f /tmp/r5_close2.pid
