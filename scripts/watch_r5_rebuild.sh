#!/bin/bash
# Round-5 evidence REBUILD chain.
#
# The first round-5 session ran the learning studies and wrote their
# artifacts to results/, but committed only the DOCS that cite them —
# a VM restart then restored the repo from git and every artifact
# (r5_relational_v2.json and friends) was lost.  This chain re-runs
# every stage, in claim-priority order, and `git commit`s each
# artifact the moment it lands so no future restart can orphan a
# committed claim again.
#
# Order (claim priority, not original chain order):
#   A  core relational-v2 arms (dense / pure-local / hybrid) — the
#      evidence behind the committed "RESOLVED POSITIVE" claim
#   C1 merge off-ceiling, relational-v2 4k   (registry merge default)
#   C2 merge off-ceiling, texture-hard 4k
#   B  preset-geometry envelope at 16k (dim 384 / depth 4 / bf16)
#   A2 depth-4 global-layer placement arms (4k, d128)
#   D  depth-8 placement/count arms
#   Z  closing: bench.py (infer + train, MFU line) + on-chip suite
#
# Usage: nohup bash scripts/watch_r5_rebuild.sh > /tmp/r5_rebuild.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
echo $$ > /tmp/r5_rebuild.pid

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
  # Commit one results file immediately so a VM restart cannot lose it.
  local f=$1 msg=$2
  [ -s "$f" ] || { echo "commit_artifact: $f missing/empty"; return 1; }
  for i in 1 2 3; do
    git add "$f" && git commit -m "$msg" && return 0
    sleep 20  # index lock contention with the interactive session
  done
  echo "commit_artifact: FAILED for $f"
  return 1
}

# run_stage NAME LOG MAXSEC OUT ARGS...
#   watchdog-kills on a >45 min stale log (remote 16k compiles print
#   nothing for 5-20 min; epoch steps print every <=2 min), retries
#   once to OUT.try2.json so completed arms are never overwritten.
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

# --- A: core relational-v2 arms (the committed claim's evidence) ----
run_stage A /tmp/r5_relational_v2.log 14400 \
  results/r5_relational_v2.json \
  --task relational-v2 --image-size 256 \
  --seeds 3 --epochs 20 --steps-per-epoch 128 --batch-size 8 \
  --impls xla,xla local,local local,xla

# --- C: merge default off the ceiling (4k, d128) -------------------
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

# --- B: preset geometry (16k tokens, dim 384, bf16) ----------------
run_stage B /tmp/r5_preset_envelope.log 21600 \
  results/r5_preset_envelope_16k.json \
  --task relational-v2 --image-size 128 --patch-size 1 \
  --dim 384 --depth 4 --heads 6 --mlp-dim 1536 --dim-head 64 \
  --model-dtype bfloat16 \
  --seeds 3 --epochs 12 --steps-per-epoch 128 --batch-size 8 \
  --eval-samples 512 \
  --impls auto local,local,local,auto local \
          local,local,local,auto+merge0.5

# --- A2: depth-4 placement arms (4k, d128) -------------------------
run_stage A2 /tmp/r5_relational_v2b.log 14400 \
  results/r5_relational_v2_part2.json \
  --task relational-v2 --image-size 256 \
  --seeds 3 --epochs 20 --steps-per-epoch 128 --batch-size 8 \
  --impls xla,local,local,local local,xla,local,xla \
          local,local,local,xla xla,xla,xla,xla local,local,local,local

# --- D: depth-8 placement/count arms -------------------------------
run_stage D /tmp/r5_placement_depth8.log 14400 \
  results/r5_placement_depth8.json \
  --task relational-v2 --image-size 256 \
  --seeds 3 --epochs 16 --steps-per-epoch 128 --batch-size 8 \
  --impls local,local,local,local,local,local,local,xla \
          xla,local,local,local,local,local,local,local \
          local,local,local,xla,local,local,local,xla \
          local,local,local,local,local,local,local,local

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
