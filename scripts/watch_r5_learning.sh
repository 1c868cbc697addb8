#!/bin/bash
# Round-5 on-chip learning chain (VERDICT r4 items 1-5).  Each stage
# logs to /tmp/r5_*.log and writes its artifact incrementally (the
# harness persists after every arm), so a truncated stage still
# yields data.
#
#   A. relational-v2 instrument + schedule adjudication + placement
#      sweep at the 4k instrument geometry (d128)
#        -> results/r5_relational_v2.json (+ _part2 for the depth-4
#           arms after a remote-tunnel hang killed the first attempt
#           mid-arm-4; arms 1-3 are complete in the first file)
#   B. preset-geometry envelope at 16k (dim 384 / depth 4 / bf16):
#      flash vs hybrid vs local vs hybrid+merge, accuracy per epoch
#        -> results/r5_preset_envelope_16k.json
#   C. merge-on default off the texture ceiling at 4k:
#      relational-v2 and texture-hard, r in {0, 0.5}
#        -> results/r5_merge_relational_4k.json
#        -> results/r5_merge_texture_4k.json
#
# Stages run under a stall watchdog: the remote tunnel has been seen
# hanging a session's HTTP call indefinitely (host idle, log frozen)
# while fresh processes reach the chip fine — if a stage's log goes
# stale it is killed and retried once, with the retry writing to
# OUT.try2.json so the first attempt's completed arms are never
# overwritten.  The staleness threshold is 45 min: remote 16k compiles
# legitimately print nothing for 5-20 min (including between arms), so
# hang detection must sit above that.
#
# Usage: nohup bash scripts/watch_r5_learning.sh > /tmp/r5_chain.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
echo $$ > /tmp/r5_learning.pid

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
    sleep 240
  done
  echo "backend UP $(date)"
}

# run_stage NAME LOG MAXSEC OUT ARGS...
#   runs the harness with --out OUT (attempt 2: OUT base + .try2.json),
#   watchdog-kills on a stale log, retries once.
run_stage() {
  local name=$1 log=$2 maxsec=$3 out=$4; shift 4
  local attempt rc pid now mt
  for attempt in 1 2; do
    local dest=$out
    [ $attempt -eq 2 ] && dest="${out%.json}.try2.json"
    wait_backend
    echo "stage $name attempt $attempt -> $dest $(date)"
    python scripts/local_attention_learning.py "$@" --out "$dest" \
      > "$log" 2>&1 &
    pid=$!
    local deadline=$(( $(date +%s) + maxsec ))
    local stale_lim
    while kill -0 $pid 2>/dev/null; do
      sleep 120
      now=$(date +%s)
      mt=$(stat -c %Y "$log" 2>/dev/null || echo "$now")
      # 45 min covers the longest observed remote 16k compile (which
      # prints nothing, including between arms); anything staler is a
      # tunnel hang.  Epoch steps themselves print every <=2 min.
      stale_lim=2700
      if [ $(( now - mt )) -gt $stale_lim ]; then
        echo "stage $name attempt $attempt STALLED (log stale "\
"$(( now - mt ))s), killing $pid $(date)"
        kill $pid 2>/dev/null
        sleep 5; kill -9 $pid 2>/dev/null
        break
      fi
      if [ "$now" -gt "$deadline" ]; then
        echo "stage $name attempt $attempt TIMEOUT, killing $pid $(date)"
        kill $pid 2>/dev/null
        sleep 5; kill -9 $pid 2>/dev/null
        break
      fi
    done
    wait $pid 2>/dev/null; rc=$?
    echo "stage $name attempt $attempt exit=$rc $(date)"
    [ $rc -eq 0 ] && return 0
  done
  return 1
}

# --- Stage A (remainder): depth-4 placement arms (4k, d128) --------
# Arms 1-3 (xla,xla / local,local / local,xla) completed in the first
# attempt and live in results/r5_relational_v2.json; this reruns the
# depth-4 arms the tunnel hang interrupted.
run_stage A2 /tmp/r5_relational_v2b.log 14400 \
  results/r5_relational_v2_part2.json \
  --task relational-v2 --image-size 256 \
  --seeds 3 --epochs 20 --steps-per-epoch 128 --batch-size 8 \
  --impls xla,local,local,local local,xla,local,xla \
          local,local,local,xla xla,xla,xla,xla local,local,local,local

# --- Stage B: preset geometry (16k tokens, dim 384, bf16) ----------
run_stage B /tmp/r5_preset_envelope.log 28800 \
  results/r5_preset_envelope_16k.json \
  --task relational-v2 --image-size 128 --patch-size 1 \
  --dim 384 --depth 4 --heads 6 --mlp-dim 1536 --dim-head 64 \
  --model-dtype bfloat16 \
  --seeds 3 --epochs 12 --steps-per-epoch 128 --batch-size 8 \
  --eval-samples 512 \
  --impls auto local,local,local,auto local \
          local,local,local,auto+merge0.5

# --- Stage C: merge default off-ceiling (4k, d128) -----------------
run_stage C1 /tmp/r5_merge_relational.log 10800 \
  results/r5_merge_relational_4k.json \
  --task relational-v2 --image-size 256 \
  --seeds 3 --epochs 12 --steps-per-epoch 128 --batch-size 8 \
  --impls xla,xla xla,xla+merge0.5

run_stage C2 /tmp/r5_merge_texture.log 10800 \
  results/r5_merge_texture_4k.json \
  --task texture-hard --image-size 256 --texture-amp 0.06 \
  --seeds 3 --epochs 12 --steps-per-epoch 128 --batch-size 8 \
  --impls xla,xla xla,xla+merge0.5

echo "r5 learning chain DONE $(date)"
rm -f /tmp/r5_learning.pid
