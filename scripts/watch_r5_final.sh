#!/bin/bash
# Round-5 final chain: the 16k preset-geometry envelope (stage B,
# re-run after both rebuild-chain attempts died on the crash-looping
# backend at ~00:50), then the closing benches + on-chip suite.
#
# B is trimmed to fit the remaining round (epochs 12 -> 8; on
# relational-v2 every global-bearing arm solves at epoch 1 and local
# pinning is visible well inside 8 epochs), and the pure-local arm
# runs LAST: it is confirmatory (4k already proved pinning), so a
# timeout loses the least informative arm first.
#
# Usage: nohup bash scripts/watch_r5_final.sh > /tmp/r5_final.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
echo $$ > /tmp/r5_final.pid

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
  [ -s "$f" ] || return 1
  for i in 1 2 3; do
    git add "$f" && git commit -m "$msg" && return 0
    sleep 20
  done
  return 1
}

# --- B (trimmed): preset geometry, 16k tokens, dim 384, bf16 -------
for attempt in 1 2 3; do
  dest=results/r5_preset_envelope_16k.json
  [ $attempt -gt 1 ] && dest=results/r5_preset_envelope_16k.try$attempt.json
  wait_backend
  echo "stage B attempt $attempt -> $dest $(date)"
  timeout 10800 python scripts/local_attention_learning.py \
    --task relational-v2 --image-size 128 --patch-size 1 \
    --dim 384 --depth 4 --heads 6 --mlp-dim 1536 --dim-head 64 \
    --model-dtype bfloat16 \
    --seeds 3 --epochs 8 --steps-per-epoch 128 --batch-size 8 \
    --steps-per-call 16 --eval-samples 512 \
    --impls auto local,local,local,auto \
            local,local,local,auto+merge0.5 local \
    --out "$dest" > /tmp/r5_preset_envelope.log 2>&1
  rc=$?
  echo "stage B attempt $attempt exit=$rc $(date)"
  if [ -s "$dest" ]; then
    commit_artifact "$dest" "results: 16k preset-geometry envelope ($(basename "$dest"))"
  fi
  [ $rc -eq 0 ] && break
  sleep 120
done

# --- Z: closing benches + on-chip suite ----------------------------
wait_backend
timeout 3600 python bench.py > /tmp/r5_bench_infer.log 2>&1
echo "bench infer exit=$? $(date)"
timeout 3600 python bench.py --train > /tmp/r5_bench_train.log 2>&1
echo "bench train exit=$? $(date)"
SFC_VIT_TPU_TESTS=1 timeout 5400 python -m pytest \
  tests/test_tpu_hardware.py -q > /tmp/r5_onchip_suite.log 2>&1
echo "on-chip suite exit=$? $(date)"

echo "r5 final chain DONE $(date)"
rm -f /tmp/r5_final.pid
