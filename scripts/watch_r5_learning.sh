#!/bin/bash
# Round-5 on-chip learning chain (VERDICT r4 items 1-5).  Each stage
# logs to /tmp/r5_*.log and writes its artifact incrementally (the
# harness persists after every arm), so a truncated stage still
# yields data.
#
#   A. relational-v2 instrument + schedule adjudication + placement
#      sweep at the 4k instrument geometry (d128)
#        -> results/r5_relational_v2.json
#   B. preset-geometry envelope at 16k (dim 384 / depth 4 / bf16):
#      flash vs hybrid vs local vs hybrid+merge, accuracy per epoch
#        -> results/r5_preset_envelope_16k.json
#   C. merge-on default off the texture ceiling at 4k:
#      relational-v2 and texture-hard, r in {0, 0.5}
#        -> results/r5_merge_relational_4k.json
#        -> results/r5_merge_texture_4k.json
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

while ! probe; do
  echo "backend down $(date)"
  sleep 240
done
echo "backend UP $(date)"

# --- Stage A: instrument + adjudication + placement (4k, d128) -----
# Depth-2 arms first (dense control / pure local / the contradicted
# r4 hybrid), then the depth-4 placement arms with their own dense +
# pure-local controls.
timeout 21600 python scripts/local_attention_learning.py \
  --task relational-v2 --image-size 256 \
  --seeds 3 --epochs 20 --steps-per-epoch 128 --batch-size 8 \
  --impls xla,xla local,local local,xla \
          xla,local,local,local local,xla,local,xla \
          local,local,local,xla xla,xla,xla,xla local,local,local,local \
  --out results/r5_relational_v2.json \
  > /tmp/r5_relational_v2.log 2>&1
echo "stage A exit=$? $(date)"

# --- Stage B: preset geometry (16k tokens, dim 384, bf16) ----------
# The longctx-16k(-hybrid) shapes: flash dense control, the shipped
# hybrid schedule, pure local, and the hybrid with the preset's merge
# default on top.
timeout 28800 python scripts/local_attention_learning.py \
  --task relational-v2 --image-size 128 --patch-size 1 \
  --dim 384 --depth 4 --heads 6 --mlp-dim 1536 --dim-head 64 \
  --model-dtype bfloat16 \
  --seeds 3 --epochs 12 --steps-per-epoch 128 --batch-size 8 \
  --eval-samples 512 \
  --impls auto local,local,local,auto local \
          local,local,local,auto+merge0.5 \
  --out results/r5_preset_envelope_16k.json \
  > /tmp/r5_preset_envelope.log 2>&1
echo "stage B exit=$? $(date)"

# --- Stage C: merge default off-ceiling (4k, d128) -----------------
timeout 10800 python scripts/local_attention_learning.py \
  --task relational-v2 --image-size 256 \
  --seeds 3 --epochs 12 --steps-per-epoch 128 --batch-size 8 \
  --impls xla,xla xla,xla+merge0.5 \
  --out results/r5_merge_relational_4k.json \
  > /tmp/r5_merge_relational.log 2>&1
echo "stage C1 exit=$? $(date)"

timeout 10800 python scripts/local_attention_learning.py \
  --task texture-hard --image-size 256 --texture-amp 0.06 \
  --seeds 3 --epochs 12 --steps-per-epoch 128 --batch-size 8 \
  --impls xla,xla xla,xla+merge0.5 \
  --out results/r5_merge_texture_4k.json \
  > /tmp/r5_merge_texture.log 2>&1
echo "stage C2 exit=$? $(date)"

echo "r5 learning chain DONE $(date)"
rm -f /tmp/r5_learning.pid
