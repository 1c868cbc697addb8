"""Locality-metric formula tests (sfc_demo.ipynb cell 14 semantics)."""

import math

import numpy as np
import pytest

from sfc_vit_tpu.curves import (
    clustering_number,
    compare_generalizers,
    curve_coords,
    segment_stats,
)


def test_segment_stats_raster_4x4():
    curve = curve_coords("raster", 4, 4)
    stats = segment_stats(curve, 4, 4)
    # 15 segments: 12 unit steps + 3 row-wrap jumps of length sqrt(9+1),
    # normalized by scale = 3.
    unit = 1.0 / 3.0
    wrap = math.hypot(3.0, 1.0) / 3.0
    assert stats["total_length"] == pytest.approx(12 * unit + 3 * wrap)
    assert stats["max_segment_length"] == pytest.approx(wrap)


def test_clustering_number_bounds():
    # Hilbert has strictly better 2x2 clustering than raster.
    for grid in [8, 16]:
        h = clustering_number(curve_coords("hilbert", grid, grid), grid, grid)
        r = clustering_number(curve_coords("raster", grid, grid), grid, grid)
        assert 1.0 <= h < r


def test_compare_generalizers_smoke():
    s, e = compare_generalizers("hilbert", 12, 12)
    for d in (s, e):
        assert set(d) == {
            "total_length",
            "avg_segment_length",
            "max_segment_length",
            "std_segment_length",
            "clustering_number",
        }
        assert d["clustering_number"] >= 1.0
    # On an exact power-of-2 square both generalizers give the pure curve.
    assert s["total_length"] == pytest.approx(e["total_length"], rel=0.3)


def test_locality_ordering_published_direction():
    """Regression toward BASELINE.md: embedded curves have smaller
    max/std segment length than stitched on irregular grids (direction of
    the published averages)."""
    s, e = compare_generalizers("hilbert", 12, 10)
    assert e["max_segment_length"] <= s["max_segment_length"] + 1e-9
