#!/bin/bash
# Round-4 on-chip measurement chain.  Waits for the TPU backend, lets
# the round-3 close-out watcher (watch_backend.sh) finish its queue
# first if it is mid-run, then executes the round-4 measured items in
# order, each logged to /tmp/r4_*.log:
#   1. r4_fill_bf16exp.py        -> results/r3_train_final_ab.json (fill)
#   2. r4_bs64_close.py          -> results/r4_bs64_close.json
#   3. r4_token_merge_ab.py      -> results/r4_token_merge_ab.json
#   4. local_attention_learning.py -> results/local_attention_learning.json
#   5. retrofit_finetune.py (ViT-B/16 geometry, synthetic ckpt)
#                                -> results/r4_retrofit_onchip.json
#
# Usage: nohup bash scripts/watch_r4_chain.sh > /tmp/r4_chain.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

probe() {
  timeout 900 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
d = jax.devices()
assert d and d[0].platform != "cpu", d
x = jnp.ones((8, 8))
assert float((x @ x).sum()) == 512.0
EOF
}

while ! probe; do
  echo "backend down $(date)"
  sleep 240
done
echo "backend UP $(date)"

# Let the r3 watcher's chain drain (it runs serving A/B + benches +
# on-chip suite once the backend answers).  Marker: its last step's
# log stops growing AND the watcher printed its final exit line, or
# the watcher is simply not running.
while pgrep -f watch_backend.sh >/dev/null 2>&1 \
      && ! grep -q "on-chip suite exit" /tmp/backend_watch.log 2>/dev/null; do
  echo "waiting for r3 close-out chain $(date)"
  sleep 300
done
echo "r3 chain clear $(date)"

run() {
  name=$1; shift
  echo "=== $name start $(date)"
  timeout 14400 "$@" > "/tmp/r4_${name}.log" 2>&1
  echo "=== $name exit=$? $(date)"
}

run fill_bf16exp   python scripts/r4_fill_bf16exp.py
run bs64_close     python scripts/r4_bs64_close.py
run token_merge    python scripts/r4_token_merge_ab.py
run local_attn     python scripts/local_attention_learning.py
run retrofit       python scripts/retrofit_finetune.py \
  --synthetic-weights --dataset synthetic --img-size 224 \
  --batch-size 64 --stage1-epochs 2 --stage2-epochs 6 \
  --steps-per-epoch 16 --workdir /tmp/r4_retrofit \
  --out results/r4_retrofit_onchip.json
echo "r4 chain DONE $(date)"
