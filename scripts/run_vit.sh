#!/usr/bin/env bash
# TPU-VM launcher -- the equivalent of the reference's SLURM script
# (run_vit.sh:1-20: 1x H100, venv, python main.py), re-targeted at TPU.
# Runs the reference's flagship configuration (main.py:269-314).
set -euo pipefail

DATA_ROOT="${DATA_ROOT:-/data/cifar10}"
WORKDIR="${WORKDIR:-runs/vit1d_morton}"

exec python -m sfc_vit_tpu.cli \
  --dataset cifar10 --data-root "$DATA_ROOT" \
  --model vit1d --tokenizer hierarchical --curve morton \
  --patch-size-list 16 4 1 --embed-dim 256 --depth 8 --heads 4 --mlp-dim 512 \
  --batch-size 512 --epochs 300 --warmup-epochs 10 \
  --lr 3e-4 --weight-decay 5e-5 --dtype bfloat16 \
  --workdir "$WORKDIR" --resume "$@"
