"""Curve-locality metrics (vectorized numpy).

Reimplements the quantitative metrics suite from the reference's
``notebooks/sfc_demo.ipynb`` cell 14 -- the closest thing the reference
has to a test suite and its only committed quantitative results
(BASELINE.md): normalized segment-length statistics and the 2x2-window
"clustering number".
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np

from .generalize import block_stitch_sfc, embed_and_prune_sfc

__all__ = [
    "segment_stats",
    "clustering_number",
    "compare_generalizers",
    "sweep_generalizers",
]


def segment_stats(curve: Sequence[Tuple[int, int]], width: int, height: int) -> Dict[str, float]:
    """Segment-length stats with coordinates normalized to the unit square.

    Matches sfc_demo cell 14 ``compute_curve_stats``: scale is
    max(width-1, height-1) (or 1), stats over consecutive-point distances.
    """
    pts = np.asarray(curve, dtype=np.float64)
    scale = max(width - 1, height - 1) or 1
    pts = pts / scale
    seg = np.hypot(*np.diff(pts, axis=0).T)
    if seg.size == 0:  # single-point curve (1x1 grid): no segments
        return {
            "total_length": 0.0,
            "avg_segment_length": 0.0,
            "max_segment_length": 0.0,
            "std_segment_length": 0.0,
        }
    return {
        "total_length": float(seg.sum()),
        "avg_segment_length": float(seg.mean()),
        "max_segment_length": float(seg.max()),
        "std_segment_length": float(seg.std()),
    }


def clustering_number(
    curve: Sequence[Tuple[int, int]],
    width: int,
    height: int,
    query_size: Tuple[int, int] = (2, 2),
    sample_windows: int | None = 1000,
    seed: int = 0,
) -> float:
    """Average number of curve-contiguous runs covering a query window.

    For each qh x qw window, collect the curve positions of its cells and
    count maximal runs of consecutive indices; 1.0 is perfect locality.
    Matches sfc_demo cell 14 ``compute_clustering_number`` (which samples
    windows with ``random.sample``; we sample with a seeded numpy
    Generator for reproducibility).
    """
    qh, qw = query_size
    pos = np.full((width, height), -1, dtype=np.int64)
    arr = np.asarray(curve, dtype=np.int64)
    pos[arr[:, 0], arr[:, 1]] = np.arange(arr.shape[0])

    ys, xs = np.meshgrid(
        np.arange(height - qh + 1), np.arange(width - qw + 1), indexing="ij"
    )
    corners = np.stack([ys.ravel(), xs.ravel()], axis=1)
    if sample_windows is not None and corners.shape[0] > sample_windows:
        rng = np.random.default_rng(seed)
        corners = corners[
            rng.choice(corners.shape[0], size=sample_windows, replace=False)
        ]

    counts = np.empty(corners.shape[0], dtype=np.float64)
    dy, dx = np.meshgrid(np.arange(qh), np.arange(qw), indexing="ij")
    dy, dx = dy.ravel(), dx.ravel()
    for n, (y0, x0) in enumerate(corners):
        idx = np.sort(pos[x0 + dx, y0 + dy])
        counts[n] = 1 + int(np.count_nonzero(np.diff(idx) != 1))
    return float(counts.mean())


def compare_generalizers(
    sfc, width: int, height: int, seed: int = 0
) -> Tuple[Dict[str, float], Dict[str, float]]:
    """Metrics for block-stitched vs embed-and-pruned curves on one grid."""
    stitched, _ = block_stitch_sfc(sfc, width, height)
    embedded = embed_and_prune_sfc(sfc, width, height)
    out = []
    for curve in (stitched, embedded):
        stats = segment_stats(curve, width, height)
        stats["clustering_number"] = clustering_number(
            curve, width, height, seed=seed
        )
        out.append(stats)
    return out[0], out[1]


def sweep_generalizers(
    curves: Sequence, min_size: int = 2, max_size: int = 50, seed: int = 0
) -> Dict[str, Dict[str, float]]:
    """Average metrics over all W x H in [min, max]^2 for the given curves.

    Reproduces the sfc_demo cell-14 sweep whose printed averages are the
    reference's only published numbers (BASELINE.md).
    """
    acc_s: Dict[str, list] = {}
    acc_e: Dict[str, list] = {}
    for sfc in curves:
        for h in range(min_size, max_size + 1):
            for w in range(min_size, max_size + 1):
                s, e = compare_generalizers(sfc, w, h, seed=seed)
                for k, v in s.items():
                    acc_s.setdefault(k, []).append(v)
                for k, v in e.items():
                    acc_e.setdefault(k, []).append(v)
    return {
        "stitched": {k: float(np.mean(v)) for k, v in acc_s.items()},
        "embedded": {k: float(np.mean(v)) for k, v in acc_e.items()},
    }
