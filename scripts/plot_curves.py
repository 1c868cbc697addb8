#!/usr/bin/env python
"""Curve visualization (sfc_demo.ipynb cells 3-12 / generators __main__).

Saves PNGs of each curve at the requested orders, plus embed-and-prune
vs block-stitch comparisons on an arbitrary rectangle and (optionally)
the Hamiltonian refinement.

    python scripts/plot_curves.py --out /tmp/curves --width 12 --height 12
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, ".")

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from sfc_vit_tpu.curves import (  # noqa: E402
    CURVE_REGISTRY,
    block_stitch_sfc,
    curve_cells,
    embed_and_prune_sfc,
    refine_curve_to_hamiltonian,
)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="curve_plots")
    p.add_argument("--orders", type=int, nargs="+", default=[1, 2, 3])
    p.add_argument("--width", type=int, default=12)
    p.add_argument("--height", type=int, default=12)
    p.add_argument("--hamiltonian", action="store_true")
    args = p.parse_args(argv)

    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    names = [n for n in CURVE_REGISTRY if n not in ("morton",)]
    fig, axes = plt.subplots(
        len(names), len(args.orders),
        figsize=(3 * len(args.orders), 3 * len(names)),
    )
    for r, name in enumerate(names):
        for c, order in enumerate(args.orders):
            cells = curve_cells(name, order)
            ax = axes[r][c] if len(names) > 1 else axes[c]
            ax.plot(cells[:, 0], cells[:, 1], marker=".", lw=0.8, ms=2)
            ax.set_title(f"{name} order {order}", fontsize=8)
            ax.set_aspect("equal")
            ax.axis("off")
    fig.tight_layout()
    fig.savefig(out / "curves_by_order.png", dpi=120)
    plt.close(fig)

    w, h = args.width, args.height
    fig, axes = plt.subplots(2, 4, figsize=(14, 7))
    for c, name in enumerate(["hilbert", "peano", "moore", "z"]):
        emb = embed_and_prune_sfc(name, w, h)
        sti, _ = block_stitch_sfc(name, w, h)
        for r, (curve, label) in enumerate(
            [(emb, "embed&prune"), (sti, "block-stitch")]
        ):
            xs, ys = zip(*curve)
            axes[r][c].plot(xs, ys, marker=".", lw=0.8, ms=2)
            axes[r][c].set_title(f"{name} {label} {w}x{h}", fontsize=8)
            axes[r][c].set_aspect("equal")
    fig.tight_layout()
    fig.savefig(out / f"generalizers_{w}x{h}.png", dpi=120)
    plt.close(fig)

    if args.hamiltonian:
        guide = embed_and_prune_sfc("hilbert", w, h)
        ham = refine_curve_to_hamiltonian(guide, w, h)
        if ham:
            xs, ys = zip(*ham)
            fig, ax = plt.subplots(figsize=(5, 5))
            ax.plot(xs, ys, marker=".", lw=0.8, ms=3)
            ax.set_title(f"hamiltonian refinement {w}x{h}")
            ax.set_aspect("equal")
            fig.savefig(out / f"hamiltonian_{w}x{h}.png", dpi=120)
            plt.close(fig)

    print(f"wrote plots to {out}")


if __name__ == "__main__":
    main()
