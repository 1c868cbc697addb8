"""bf16-softmax accuracy study (round-2 VERDICT item #2).

Question: does computing the attention softmax in bf16 (no fp32
round-trip — ``attn_impl='xla_bf16'``) change learning outcomes?  The
fp32 round-trip was profiled at ~50% of per-layer attention time at
ViT-B shapes (TODO.md round 1), and the bf16 path measured +4.9%
end-to-end — but round 1 shipped it opt-in pending this study.

Protocol: train the flagship (VisionTransformer1D + hierarchical
Morton) and CurveViT on the class-separable synthetic set, bf16
activations, NO mixing/augment (minimum noise), N seeds x E epochs,
identical data order per seed across arms.  Emit per-epoch test
accuracy and the final-accuracy mean/std per arm.

Decision rule (applied in ops/attention auto dispatch): accuracy-
neutral if |mean_final(xla_bf16) - mean_final(xla)| <= 1 pooled std.

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/bf16_softmax_study.py
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, default=3)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--steps-per-epoch", type=int, default=16)
    p.add_argument("--platform", default=None)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    from sfc_vit_tpu.data import (
        epoch_batches,
        make_eval_transform,
        synthetic_dataset,
    )
    from sfc_vit_tpu.parallel import make_mesh
    from sfc_vit_tpu.registry import ModelConfig, build_model
    from sfc_vit_tpu.training import TrainConfig, Trainer

    train_ds = synthetic_dataset(n=4096, hw=32, seed=0)
    test_ds = synthetic_dataset(n=512, hw=32, seed=9)
    tf = make_eval_transform((0.5,) * 3, (0.25,) * 3)
    steps = min(len(train_ds) // args.batch_size, args.steps_per_epoch)

    def data(ds, epoch, seed, shuffle=True):
        count = 0
        for xb, yb in epoch_batches(ds, args.batch_size, seed=seed,
                                    epoch=epoch, shuffle=shuffle):
            if count >= steps and shuffle:
                break
            count += 1
            yield np.asarray(tf(xb)), yb

    model_cfgs = {
        "flagship_vit1d": dict(
            model="vit1d", tokenizer="hierarchical", curve="morton",
            img_size=32, patch_size_list=(16, 4, 1), embed_dim=256,
            depth=8, n_heads=4, mlp_dim=512,
        ),
        "curvevit": dict(
            model="curvevit", tokenizer="1d", curve="hilbert",
            img_size=32, patch_size=4, embed_dim=256, depth=6,
            n_heads=4, mlp_dim=512,
        ),
    }

    results = {}
    for mname, mkw in model_cfgs.items():
        results[mname] = {}
        for impl in ("xla", "xla_bf16"):
            accs = []
            for seed in range(args.seeds):
                model = build_model(ModelConfig(
                    num_classes=train_ds.num_classes, dtype="bfloat16",
                    attn_impl=impl, **mkw,
                ))
                cfg = TrainConfig(
                    num_classes=train_ds.num_classes, epochs=args.epochs,
                    warmup_epochs=1, base_lr=3e-4, use_mixing=False,
                    seed=seed, data_parallel=1,
                )
                tr = Trainer(
                    model, cfg, steps_per_epoch=steps,
                    sample_input=np.zeros((2, 32, 32, 3), np.float32),
                    mesh=make_mesh(data=1, devices=jax.devices()[:1]),
                )
                per_epoch = []
                for epoch in range(args.epochs):
                    tr.train_epoch(data(train_ds, epoch, seed))
                    ev = tr.evaluate(data(test_ds, 0, 0, shuffle=False))
                    per_epoch.append(float(ev["test_accuracy"]))
                accs.append(per_epoch)
                print(f"# {mname} {impl} seed {seed}: "
                      f"final {per_epoch[-1]:.4f}", file=sys.stderr)
            arr = np.asarray(accs)
            results[mname][impl] = {
                "per_epoch_mean": arr.mean(axis=0).tolist(),
                "final_mean": float(arr[:, -1].mean()),
                "final_std": float(arr[:, -1].std()),
            }
        a = results[mname]["xla"]
        b = results[mname]["xla_bf16"]
        pooled = float(np.sqrt(
            (a["final_std"] ** 2 + b["final_std"] ** 2) / 2
        ))
        delta = b["final_mean"] - a["final_mean"]
        results[mname]["delta_final"] = delta
        results[mname]["pooled_std"] = pooled
        results[mname]["accuracy_neutral"] = bool(
            abs(delta) <= max(pooled, 1e-3)
        )
    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    return results


if __name__ == "__main__":
    main()
