#!/bin/bash
# Round-5 final chain, v2: 16k preset envelope (stage B) under a
# stall watchdog with resume-chained retries, then closing benches +
# on-chip suite.
#
# v1 lacked the staleness watchdog and a tunnel hang froze attempt 1
# for 17 min before manual intervention.  Here: a log stale >20 min
# (expected cadence: one line per ~2.5 min epoch; arm-boundary 16k
# compiles ~6 min warm) kills the attempt; the next attempt passes
# --resume-from so completed arms are copied, not re-run.  A hard
# wall-clock stop hands over to the closing stage in time either way.
#
# Usage: nohup bash scripts/watch_r5_final2.sh > /tmp/r5_final2.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
echo $$ > /tmp/r5_final.pid

B_STOP=${B_STOP:-$(( $(date +%s) + 6300 ))}   # hand over to Z after ~1h45

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

prev=""
last_dest=""
for attempt in 1 2 3 4; do
  [ "$(date +%s)" -gt "$B_STOP" ] && { echo "B wall-stop $(date)"; break; }
  dest=results/r5_preset_envelope_16k.json
  [ $attempt -gt 1 ] && dest=results/r5_preset_envelope_16k.try$attempt.json
  resume=()
  [ -n "$prev" ] && [ -s "$prev" ] && resume=(--resume-from "$prev")
  wait_backend
  echo "stage B attempt $attempt -> $dest $(date)"
  python scripts/local_attention_learning.py \
    --task relational-v2 --image-size 128 --patch-size 1 \
    --dim 384 --depth 4 --heads 6 --mlp-dim 1536 --dim-head 64 \
    --model-dtype bfloat16 \
    --seeds 3 --epochs 8 --steps-per-epoch 128 --batch-size 8 \
    --steps-per-call 16 --eval-samples 512 \
    --impls auto local,local,local,auto \
            local,local,local,auto+merge0.5 local \
    "${resume[@]}" \
    --out "$dest" > /tmp/r5_preset_envelope.log 2>&1 &
  pid=$!
  while kill -0 $pid 2>/dev/null; do
    sleep 60
    now=$(date +%s)
    mt=$(stat -c %Y /tmp/r5_preset_envelope.log 2>/dev/null || echo "$now")
    if [ $(( now - mt )) -gt 1200 ]; then
      echo "stage B attempt $attempt STALLED ($(( now - mt ))s), killing $(date)"
      kill $pid 2>/dev/null; sleep 5; kill -9 $pid 2>/dev/null
      break
    fi
    if [ "$now" -gt "$B_STOP" ]; then
      echo "stage B attempt $attempt WALL-STOP, killing $(date)"
      kill $pid 2>/dev/null; sleep 5; kill -9 $pid 2>/dev/null
      break
    fi
  done
  wait $pid 2>/dev/null; rc=$?
  echo "stage B attempt $attempt exit=$rc $(date)"
  [ -s "$dest" ] && last_dest=$dest
  prev=$dest
  [ $rc -eq 0 ] && break
done
if [ -n "$last_dest" ]; then
  commit_artifact "$last_dest" \
    "results: 16k preset-geometry envelope ($(basename "$last_dest"))"
fi

# --- Z: closing benches + on-chip suite ----------------------------
wait_backend
timeout 3000 python bench.py > /tmp/r5_bench_infer.log 2>&1
echo "bench infer exit=$? $(date)"
timeout 3000 python bench.py --train > /tmp/r5_bench_train.log 2>&1
echo "bench train exit=$? $(date)"
SFC_VIT_TPU_TESTS=1 timeout 5400 python -m pytest \
  tests/test_tpu_hardware.py -q > /tmp/r5_onchip_suite.log 2>&1
echo "on-chip suite exit=$? $(date)"

echo "r5 final chain DONE $(date)"
rm -f /tmp/r5_final.pid
