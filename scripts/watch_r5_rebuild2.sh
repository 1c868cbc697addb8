#!/bin/bash
# Round-5 rebuild chain, part 2 (stages B/A2/D/Z).
#
# Part 1 (watch_r5_rebuild.sh) landed and committed A, C1, C2 before a
# backend outage left it idling; this remainder was relaunched with
# time-budget trims so the whole chain fits the round:
#   * A2 (depth-4 placement) 20 -> 12 epochs, D (depth-8) 16 -> 10:
#     on relational-v2 every global-bearing schedule solves at epoch 1
#     and pure-local pinning is visible well inside 12 epochs
#     (results/r5_relational_v2.json), so the long horizons bought
#     nothing but wall-clock.
#   * D runs only if it can start before the cutoff; the closing
#     benches + on-chip suite (Z) must fit before round end.
#
# Usage: nohup bash scripts/watch_r5_rebuild2.sh > /tmp/r5_rebuild2.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
echo $$ > /tmp/r5_rebuild.pid

D_CUTOFF=${D_CUTOFF:-$(( $(date +%s) + 11700 ))}  # ~04:00 UTC default

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

commit_artifact() {
  local f=$1 msg=$2
  [ -s "$f" ] || { echo "commit_artifact: $f missing/empty"; return 1; }
  for i in 1 2 3; do
    git add "$f" && git commit -m "$msg" && return 0
    sleep 20
  done
  echo "commit_artifact: FAILED for $f"
  return 1
}

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
    while kill -0 $pid 2>/dev/null; do
      sleep 120
      now=$(date +%s)
      mt=$(stat -c %Y "$log" 2>/dev/null || echo "$now")
      if [ $(( now - mt )) -gt 2700 ]; then
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
    if [ -s "$dest" ]; then
      commit_artifact "$dest" "results: $name stage of the r5 rebuild chain ($(basename "$dest"))"
    fi
    [ $rc -eq 0 ] && return 0
  done
  return 1
}

# --- B: preset geometry (16k tokens, dim 384, bf16) ----------------
run_stage B /tmp/r5_preset_envelope.log 10800 \
  results/r5_preset_envelope_16k.json \
  --task relational-v2 --image-size 128 --patch-size 1 \
  --dim 384 --depth 4 --heads 6 --mlp-dim 1536 --dim-head 64 \
  --model-dtype bfloat16 \
  --seeds 3 --epochs 12 --steps-per-epoch 128 --batch-size 8 \
  --eval-samples 512 \
  --impls auto local,local,local,auto local \
          local,local,local,auto+merge0.5

# --- A2: depth-4 placement arms (4k, d128) -------------------------
run_stage A2 /tmp/r5_relational_v2b.log 7200 \
  results/r5_relational_v2_part2.json \
  --task relational-v2 --image-size 256 \
  --seeds 3 --epochs 12 --steps-per-epoch 128 --batch-size 8 \
  --impls xla,local,local,local local,xla,local,xla \
          local,local,local,xla xla,xla,xla,xla local,local,local,local

# --- D: depth-8 placement/count arms (time-permitting) -------------
if [ "$(date +%s)" -lt "$D_CUTOFF" ]; then
  run_stage D /tmp/r5_placement_depth8.log 7200 \
    results/r5_placement_depth8.json \
    --task relational-v2 --image-size 256 \
    --seeds 3 --epochs 10 --steps-per-epoch 128 --batch-size 8 \
    --impls local,local,local,local,local,local,local,xla \
            xla,local,local,local,local,local,local,local \
            local,local,local,xla,local,local,local,xla \
            local,local,local,local,local,local,local,local
else
  echo "stage D SKIPPED (past cutoff) $(date)"
fi

# --- Z: closing benches + on-chip suite ----------------------------
wait_backend
timeout 3600 python bench.py > /tmp/r5_bench_infer.log 2>&1
echo "bench infer exit=$? $(date)"
timeout 3600 python bench.py --train > /tmp/r5_bench_train.log 2>&1
echo "bench train exit=$? $(date)"
SFC_VIT_TPU_TESTS=1 timeout 5400 python -m pytest \
  tests/test_tpu_hardware.py -q > /tmp/r5_onchip_suite.log 2>&1
echo "on-chip suite exit=$? $(date)"

echo "r5 rebuild chain DONE $(date)"
rm -f /tmp/r5_rebuild.pid
