"""End-to-end retrofit fine-tune driver.

The runnable equivalent of the reference's ``notebooks/pretrained_ViT.
ipynb`` cell 7: load a (torchvision-layout) pretrained ViT state_dict,
reorder its patch tokens along a space-filling curve, swap the head for
the target class count, and fine-tune with the notebook's two-stage
recipe — stage 1: ``E`` epochs under a cosine schedule over ``E``;
stage 2: ``3*E`` epochs under a fresh cosine over ``3*E`` — both with
mixup + soft-target cross-entropy + AdamW(3e-4) and periodic Orbax
checkpoints (the notebook saves every 5 epochs; the Trainer keeps
best + periodic).

Checkpoint sources, in order of preference:
  --checkpoint x.pth / x.pt   torch.load (CPU) state_dict
  --checkpoint x.npz          numpy archive with the same key layout
  --synthetic-weights         random weights in the torchvision layout
                              (smoke/tests on zero-egress machines)

Example (smoke):
    python scripts/retrofit_finetune.py --synthetic-weights \
        --dataset synthetic --img-size 64 --batch-size 32 \
        --stage1-epochs 1 --stage2-epochs 1 --steps-per-epoch 2 \
        --platform cpu
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", default=None,
                   help="torchvision-layout state_dict (.pth/.pt/.npz)")
    p.add_argument("--synthetic-weights", action="store_true",
                   help="random tiny weights (smoke mode, no checkpoint)")
    p.add_argument("--dataset", default="synthetic",
                   choices=["synthetic", "cifar10", "tiny-imagenet",
                            "imagefolder"])
    p.add_argument("--data-root", default=None)
    p.add_argument("--img-size", type=int, default=128,
                   help="fine-tune resolution (pos-emb resized; notebook "
                        "uses 128)")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--num-classes", type=int, default=None,
                   help="head swap target (default: dataset classes)")
    p.add_argument("--curve", default="hilbert")
    p.add_argument("--posemb", default="learned",
                   choices=["learned", "gfpe"])
    p.add_argument("--attn-impl", default="auto")
    p.add_argument("--dtype", default=None)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--weight-decay", type=float, default=5e-5)
    p.add_argument("--stage1-epochs", type=int, default=50)
    p.add_argument("--stage2-epochs", type=int, default=None,
                   help="default 3x stage1 (notebook cell 7)")
    p.add_argument("--steps-per-epoch", type=int, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--workdir", default=None)
    p.add_argument("--out", default=None,
                   help="write a JSON artifact (per-epoch metrics from "
                        "each stage's metrics.jsonl + config) here; "
                        "requires --workdir for the learning curves")
    p.add_argument("--platform", default=None)
    return p


def _load_state_dict(args):
    from sfc_vit_tpu.models.retrofit import synthetic_torchvision_state_dict

    if args.synthetic_weights:
        return synthetic_torchvision_state_dict()
    if not args.checkpoint:
        sys.exit("need --checkpoint or --synthetic-weights")
    if args.checkpoint.endswith(".npz"):
        return dict(np.load(args.checkpoint))
    import torch  # CPU-only torch is baked in

    obj = torch.load(args.checkpoint, map_location="cpu")
    sd = obj.get("model_state_dict", obj.get("state_dict", obj)) \
        if isinstance(obj, dict) else obj
    return sd


def main(argv=None) -> dict:
    args = build_parser().parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    from sfc_vit_tpu.cli import _load_dataset
    from sfc_vit_tpu.data import (
        epoch_batches,
        make_eval_transform,
        make_train_augment,
    )
    from sfc_vit_tpu.models.retrofit import load_torchvision_vit
    from sfc_vit_tpu.training import TrainConfig, Trainer

    train_ds, test_ds, (mean, std) = _load_dataset(args)
    num_classes = args.num_classes or train_ds.num_classes

    sd = _load_state_dict(args)
    model, params = load_torchvision_vit(
        sd, image_size=args.img_size, num_classes=num_classes,
        curve=args.curve, posemb=args.posemb, dtype=args.dtype,
        attn_impl=args.attn_impl, rng=jax.random.key(args.seed),
    )
    print(
        f"retrofit: dim={model.dim} depth={model.depth} "
        f"grid={model.grid_size} curve={args.curve} posemb={args.posemb} "
        f"classes={num_classes}",
        file=sys.stderr,
    )

    steps = len(train_ds) // args.batch_size
    if args.steps_per_epoch:
        steps = min(steps, args.steps_per_epoch)
    stage2 = (
        args.stage2_epochs
        if args.stage2_epochs is not None
        else 3 * args.stage1_epochs
    )

    aug = make_train_augment(args.img_size, mean, std)
    eval_tf = make_eval_transform(mean, std)
    aug_key = jax.random.key(args.seed + 17)
    epoch_holder = [0]

    def train_epoch_data():
        epoch = epoch_holder[0]
        epoch_holder[0] += 1
        count = 0
        for xb, yb in epoch_batches(
            train_ds, args.batch_size, seed=args.seed, epoch=epoch
        ):
            if count >= steps:
                break
            count += 1
            x = aug(jax.random.fold_in(aug_key, epoch * 100003 + count), xb)
            yield np.asarray(x), yb

    def eval_data():
        for xb, yb in epoch_batches(
            test_ds, args.batch_size, shuffle=False, drop_last=False
        ):
            yield np.asarray(eval_tf(xb)), yb

    sample = np.zeros((2, args.img_size, args.img_size, 3), np.float32)
    results = {}
    stage_params = params
    for stage, epochs in (("stage1", args.stage1_epochs),
                          ("stage2", stage2)):
        if epochs <= 0:
            continue
        cfg = TrainConfig(
            num_classes=num_classes, epochs=epochs, warmup_epochs=0,
            base_lr=args.lr, weight_decay=args.weight_decay,
            schedule="cosine_min_lr", seed=args.seed,
            workdir=f"{args.workdir}/{stage}" if args.workdir else None,
        )
        trainer = Trainer(
            model, cfg, steps_per_epoch=steps, sample_input=sample,
            init_params=stage_params,
        )
        res = trainer.fit(train_epoch_data, eval_data)
        results[stage] = res
        stage_params = jax.device_get(trainer.state.params)
        print(
            f"{stage}: epochs={epochs} "
            f"best_test_accuracy={res.get('best_test_accuracy', 0):.4f}",
            file=sys.stderr,
        )

    if args.out:
        import json
        import pathlib

        curves = {}
        if args.workdir:
            for stage in results:
                mf = pathlib.Path(args.workdir) / stage / "metrics.jsonl"
                if mf.exists():
                    curves[stage] = [
                        json.loads(line)
                        for line in mf.read_text().splitlines() if line
                    ]
        artifact = {
            "protocol": {
                "driver": "pretrained_ViT.ipynb cell-7 two-stage cosine",
                "checkpoint": args.checkpoint or "synthetic-weights",
                "dataset": args.dataset, "img_size": args.img_size,
                "curve": args.curve, "posemb": args.posemb,
                "batch_size": args.batch_size,
                "stage1_epochs": args.stage1_epochs,
                "stage2_epochs": stage2,
                "backend": jax.default_backend(),
            },
            "summary": {
                s: {k: v for k, v in r.items()
                    if isinstance(v, (int, float))}
                for s, r in results.items()
            },
            "learning_curves": curves,
        }
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=2)
    print(results)
    return results


if __name__ == "__main__":
    main()
