#!/usr/bin/env python
"""Curve-vs-raster training comparison (hilbert.ipynb reproduction).

Trains the notebook's setup -- VisionTransformer d6/h4/D256/mlp256 with a
2D patch-4 tokenizer -- once per seed for each curve and reports
mean +/- std accuracy per epoch (``hilbert.ipynb`` cells 3, 5, 9;
AdamW 1e-4, cosine T_max=10, 10 epochs).

    python scripts/compare_curves.py --dataset cifar10 --data-root /data \\
        --curves hilbert raster --seeds 3
    python scripts/compare_curves.py --dataset synthetic --epochs 3  # smoke
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="synthetic",
                   choices=["synthetic", "cifar10"])
    p.add_argument("--data-root", default=None)
    p.add_argument("--curves", nargs="+", default=["hilbert", "raster"])
    p.add_argument("--seeds", type=int, default=1)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--steps-per-epoch", type=int, default=None)
    p.add_argument("--platform", default=None)
    p.add_argument("--out", default=None, help="write JSON results here")
    p.add_argument("--plot", default=None,
                   help="write the mean±std accuracy figure here (.png)")
    args = p.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    from sfc_vit_tpu.data import (
        CIFAR10_MEAN, CIFAR10_STD, epoch_batches, load_cifar10,
        make_eval_transform, synthetic_dataset,
    )
    from sfc_vit_tpu.parallel import make_mesh
    from sfc_vit_tpu.registry import ModelConfig, build_model
    from sfc_vit_tpu.training import TrainConfig, Trainer

    if args.dataset == "cifar10":
        train_ds = load_cifar10(args.data_root, True)
        test_ds = load_cifar10(args.data_root, False)
        stats = (CIFAR10_MEAN, CIFAR10_STD)
    else:
        train_ds = synthetic_dataset(n=2048, hw=32)
        test_ds = synthetic_dataset(n=512, hw=32, seed=9)
        stats = ((0.5, 0.5, 0.5), (0.25, 0.25, 0.25))
    tf = make_eval_transform(*stats)

    steps = len(train_ds) // args.batch_size
    if args.steps_per_epoch:
        steps = min(steps, args.steps_per_epoch)

    def data(ds, epoch, seed, shuffle=True):
        count = 0
        for xb, yb in epoch_batches(ds, args.batch_size, seed=seed,
                                    epoch=epoch, shuffle=shuffle):
            if count >= steps and shuffle:
                break
            count += 1
            yield np.asarray(tf(xb)), yb

    results = {}
    for curve in args.curves:
        accs = []
        for seed in range(args.seeds):
            model = build_model(ModelConfig(
                model="vit", tokenizer="2d", curve=curve, img_size=32,
                patch_size=4, embed_dim=256, depth=6, n_heads=4,
                mlp_dim=256, num_classes=train_ds.num_classes,
            ))
            cfg = TrainConfig(
                num_classes=train_ds.num_classes, epochs=args.epochs,
                warmup_epochs=0, base_lr=args.lr, use_mixing=False,
                seed=seed, data_parallel=1,
            )
            tr = Trainer(model, cfg, steps_per_epoch=steps,
                         sample_input=np.zeros((2, 32, 32, 3), np.float32),
                         mesh=make_mesh(data=1,
                                        devices=jax.devices()[:1]))
            per_epoch = []
            for epoch in range(args.epochs):
                tr.train_epoch(data(train_ds, epoch, seed))
                ev = tr.evaluate(data(test_ds, 0, 0, shuffle=False))
                per_epoch.append(ev["test_accuracy"])
            accs.append(per_epoch)
            print(f"# {curve} seed {seed}: final acc {per_epoch[-1]:.4f}",
                  file=sys.stderr)
        arr = np.asarray(accs)
        results[curve] = {
            "mean": arr.mean(axis=0).tolist(),
            "std": arr.std(axis=0).tolist(),
            "final_mean": float(arr[:, -1].mean()),
        }
    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    if args.plot:
        plot_results(results, args.plot, args.dataset)
    return results


#: Categorical series colors (fixed assignment order, pre-validated
#: 2-series pair from the dataviz reference palette: blue, orange).
_SERIES = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100"]
_SURFACE, _INK, _INK2 = "#fcfcfb", "#0b0b0b", "#52514e"


def plot_results(results: dict, path: str, dataset: str) -> None:
    """The hilbert.ipynb cell-9 headline figure: per-epoch test accuracy,
    mean line + ±1 std band per curve order."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 4.2), dpi=150)
    fig.patch.set_facecolor(_SURFACE)
    ax.set_facecolor(_SURFACE)
    finals = [r["mean"][-1] for r in results.values()]
    span = max(
        max(np.max(r["mean"]) for r in results.values())
        - min(np.min(r["mean"]) for r in results.values()),
        1e-3,
    )
    for i, (curve, r) in enumerate(results.items()):
        mean = np.asarray(r["mean"])
        std = np.asarray(r["std"])
        epochs = np.arange(1, len(mean) + 1)
        c = _SERIES[i % len(_SERIES)]
        ax.plot(epochs, mean, color=c, linewidth=2, label=curve)
        ax.fill_between(epochs, mean - std, mean + std, color=c,
                        alpha=0.15, linewidth=0)
        # dodge end-of-line labels vertically when endpoints converge
        dy = 0
        if any(abs(mean[-1] - f) < 0.04 * span
               for j, f in enumerate(finals) if j != i):
            dy = -11 * sum(
                1 for j, f in enumerate(finals[:i])
                if abs(mean[-1] - f) < 0.04 * span
            )
        ax.annotate(
            curve, (epochs[-1], mean[-1]), textcoords="offset points",
            xytext=(6, dy), color=_INK, fontsize=9, va="center",
        )
    from matplotlib.ticker import MaxNLocator

    ax.xaxis.set_major_locator(MaxNLocator(integer=True))
    ax.set_xlabel("epoch", color=_INK2)
    ax.set_ylabel("test accuracy", color=_INK2)
    ax.set_title(
        f"Curve order vs raster — {dataset} "
        f"(mean ± std over seeds)", color=_INK, fontsize=11, loc="left",
    )
    ax.grid(True, color="#e7e6e1", linewidth=0.6)
    ax.tick_params(colors=_INK2)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color("#c3c2b7")
    ax.legend(frameon=False, loc="lower right", labelcolor=_INK)
    ax.margins(x=0.08)
    fig.tight_layout()
    fig.savefig(path, facecolor=_SURFACE)
    print(f"# wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
