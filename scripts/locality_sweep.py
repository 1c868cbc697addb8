#!/usr/bin/env python
"""Curve-locality metrics sweep (sfc_demo.ipynb cell 14 reproduction).

Computes segment-length statistics and the 2x2-window clustering number
for block-stitched vs embed-and-pruned curves, averaged over all
W x H in [min, max]^2 for hilbert/peano/moore/z -- the reference's only
published numbers (BASELINE.md).  Prints the comparison table and a JSON
record; parallelized over a process pool like the notebook.

    python scripts/locality_sweep.py --min-size 2 --max-size 50
"""

from __future__ import annotations

import argparse
import json
import sys
from concurrent.futures import ProcessPoolExecutor

import numpy as np

sys.path.insert(0, ".")

from sfc_vit_tpu.curves import compare_generalizers  # noqa: E402

CURVES = ["hilbert", "peano", "moore", "z"]


def _one(job):
    curve, w, h, seed = job
    return compare_generalizers(curve, w, h, seed=seed)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--min-size", type=int, default=2)
    p.add_argument("--max-size", type=int, default=50)
    p.add_argument("--curves", nargs="+", default=CURVES)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--workers", type=int, default=None)
    args = p.parse_args(argv)

    jobs = [
        (c, w, h, args.seed)
        for c in args.curves
        for h in range(args.min_size, args.max_size + 1)
        for w in range(args.min_size, args.max_size + 1)
    ]
    with ProcessPoolExecutor(max_workers=args.workers) as ex:
        results = list(ex.map(_one, jobs, chunksize=64))

    keys = list(results[0][0])
    avg_s = {k: float(np.mean([s[k] for s, _ in results])) for k in keys}
    avg_e = {k: float(np.mean([e[k] for _, e in results])) for k in keys}

    print(f"{'Average metric over all SFCs':<25}{'Stitched':>12}{'Embedded':>12}")
    for k in keys:
        print(f"{k:<25}{avg_s[k]:12.4f}{avg_e[k]:12.4f}")
    print(json.dumps({"stitched": avg_s, "embedded": avg_e}))


if __name__ == "__main__":
    main()
