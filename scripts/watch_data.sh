#!/bin/bash
# Data-arrival automation (VERDICT r3 item 8): poll common mount points
# for the two env-blocked BASELINE inputs and auto-fire the validation
# runs the moment either appears:
#   * CIFAR-10 pickle batches  -> scripts/compare_curves.py --dataset
#     cifar10 (hilbert vs raster, 3 seeds x 10 epochs — the
#     hilbert.ipynb cell-9 protocol) -> results/compare_curves_cifar10.json
#   * a torchvision vit_b_16 state_dict (.pth/.pt/.npz) -> scripts/
#     retrofit_finetune.py (two-stage cosine, pretrained_ViT.ipynb
#     cell-7 protocol) -> results/retrofit_real_ckpt.json
# Each fires at most once (stamp files in /tmp). Logs in /tmp/r4_data_*.
#
# Usage: nohup bash scripts/watch_data.sh > /tmp/data_watch.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

find_cifar() {
  for root in /root/data /root/datasets /data /datasets /root /tmp/data; do
    [ -d "$root" ] || continue
    d=$(find "$root" -maxdepth 3 -name data_batch_1 -path "*cifar-10-batches-py*" 2>/dev/null | head -1)
    [ -n "$d" ] && { dirname "$(dirname "$d")"; return 0; }
  done
  return 1
}

find_vit_ckpt() {
  for root in /root/data /root/datasets /data /datasets /root/checkpoints /tmp/data; do
    [ -d "$root" ] || continue
    f=$(find "$root" -maxdepth 3 \( -name "*vit_b_16*.pth" -o -name "*vit_b_16*.pt" -o -name "*vit_b_16*.npz" \) 2>/dev/null | head -1)
    [ -n "$f" ] && { echo "$f"; return 0; }
  done
  return 1
}

while true; do
  if [ ! -f /tmp/cifar10_fired ] && root=$(find_cifar); then
    echo "CIFAR-10 found at $root $(date)"
    touch /tmp/cifar10_fired
    timeout 43200 python scripts/compare_curves.py --dataset cifar10 \
      --data-root "$root" --seeds 3 --epochs 10 \
      --out results/compare_curves_cifar10.json \
      --plot results/compare_curves_cifar10.png \
      > /tmp/r4_data_cifar10.log 2>&1
    echo "compare_curves cifar10 exit=$? $(date)"
  fi
  if [ ! -f /tmp/retrofit_fired ] && ckpt=$(find_vit_ckpt); then
    echo "vit_b_16 checkpoint found at $ckpt $(date)"
    touch /tmp/retrofit_fired
    croot=""
    for r in /root/data /root/datasets /data /datasets; do
      [ -d "$r/caltech256" ] && croot="$r/caltech256" && break
      [ -d "$r/256_ObjectCategories" ] && croot="$r" && break
    done
    ds_args=(--dataset synthetic)
    [ -n "$croot" ] && ds_args=(--dataset caltech256 --data-root "$croot")
    timeout 43200 python scripts/retrofit_finetune.py \
      --checkpoint "$ckpt" "${ds_args[@]}" \
      --workdir /tmp/retrofit_real \
      --out results/retrofit_real_ckpt.json \
      > /tmp/r4_data_retrofit.log 2>&1
    echo "retrofit exit=$? $(date)"
  fi
  if [ -f /tmp/cifar10_fired ] && [ -f /tmp/retrofit_fired ]; then
    echo "both targets fired; exiting $(date)"; break
  fi
  sleep 300
done
