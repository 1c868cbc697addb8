"""Rectangle generalization of space-filling curves (host-side, numpy only).

Two algorithms, behavior-matched to the reference
(``/root/reference/src/curves/space_filling_curves.py:458-591``):

* ``embed_and_prune_sfc`` -- generate the curve on the smallest covering
  power-of-base square, snap float centers to integer cells, drop cells
  outside the W x H domain.
* ``block_stitch_sfc`` -- greedily decompose the rectangle into
  power-of-base blocks, then pick for each block the dihedral symmetry
  that minimizes the Manhattan gap to its neighbours (two-end alignment).

These run once at model build; outputs become static LUTs.
"""

from __future__ import annotations

import math
from typing import Callable, List, Tuple

import numpy as np

from .generators import (
    CURVE_REGISTRY,
    hilbert_curve,
    moore_curve,
    onion_curve,
    peano_curve,
    raster_curve,
    z_curve,
)

Cell = Tuple[int, int]

__all__ = [
    "grid_size",
    "embed_and_prune_sfc",
    "get_symmetries",
    "block_stitch_sfc",
]

_BASE2 = {hilbert_curve, z_curve, moore_curve, raster_curve}


def _resolve(sfc) -> Callable:
    return CURVE_REGISTRY[sfc] if isinstance(sfc, str) else sfc


def grid_size(order: int, sfc) -> int:
    """Side length of the grid a curve of ``order`` covers.

    Matches reference ``grid_size`` (``space_filling_curves.py:458-468``),
    including the onion convention (even-rounded order, even though
    ``onion_curve`` itself doubles the order -- see the caveat on
    ``embed_and_prune_sfc``).
    """
    fn = _resolve(sfc)
    if fn in _BASE2:
        return 2 ** order
    if fn is peano_curve:
        return 3 ** order
    if fn is onion_curve:
        return order + (order % 2)
    raise ValueError(f"Unknown SFC: {getattr(fn, '__name__', fn)!r}")


def embed_and_prune_sfc(sfc, width: int, height: int) -> List[Cell]:
    """Embed a curve into a W x H rectangle and prune out-of-domain cells.

    Reference: ``space_filling_curves.py:471-491``.  Returns the ordered
    list of integer (i, j) cells with 0 <= i < width, 0 <= j < height.

    Caveat reproduced from the reference: for ``onion_curve`` the internal
    order-doubling makes the generated grid finer than ``grid_size``
    reports, so pruned cells are *not* unique; tokenizers use the direct
    spiral walk in :func:`sfc_vit_tpu.curves.luts.onion_cells` instead.
    """
    fn = _resolve(sfc)
    order = 0
    while grid_size(order, fn) < max(width, height):
        order += 1
    p = grid_size(order, fn)
    raw = np.asarray(fn(order, size=float(p)), dtype=np.float64)
    cells = np.floor(raw).astype(np.int64)
    keep = (
        (cells[:, 0] >= 0)
        & (cells[:, 0] < width)
        & (cells[:, 1] >= 0)
        & (cells[:, 1] < height)
    )
    return [tuple(c) for c in cells[keep].tolist()]


def get_symmetries(b: int) -> List[Callable[[float, float], Tuple[float, float]]]:
    """The 8 dihedral symmetries of a B x B block, as (x, y) -> (x', y').

    Order matches reference ``get_symmetries``
    (``space_filling_curves.py:494-510``): identity, three rotations, then
    the four reflections (over vertical mid, y=x, horizontal mid,
    anti-diagonal).
    """
    return [
        lambda x, y: (x, y),
        lambda x, y: (y, b - x),
        lambda x, y: (b - x, b - y),
        lambda x, y: (b - y, x),
        lambda x, y: (b - x, y),
        lambda x, y: (y, x),
        lambda x, y: (x, b - y),
        lambda x, y: (b - y, b - x),
    ]


def _block_base(fn) -> int:
    return 3 if fn is peano_curve else 2


def _block_points(fn, k: int, b: int) -> np.ndarray:
    """Curve points covering a b x b block (b = base ** k), float64.

    The reference calls ``fn(order, size=b)`` unconditionally
    (``space_filling_curves.py:537-560``), which breaks for the onion
    curve: ``onion_curve(order)`` covers a (2*order)-sided grid, so the
    block order k only covers the block for b in {2, 4}, *crashes* on
    b == 1 (``generate_coords(0)`` is empty and ``size / 0`` raises
    ZeroDivisionError -- reference bug, fixed here not reproduced) and
    under-covers b >= 8.  We call onion with order b // 2 (exact cover)
    and give the trivial 1 x 1 block its single center point directly.
    Non-onion curves keep the reference behavior bit-for-bit.
    """
    if fn is onion_curve:
        if b == 1:
            return np.asarray([[0.5, 0.5]], dtype=np.float64)
        return np.asarray(fn(b // 2, size=float(b)), dtype=np.float64)
    return np.asarray(fn(k, size=float(b)), dtype=np.float64)


def _block_order(m: int, base: int) -> int:
    """floor(log_base(m)) computed as the reference does (float log ratio).

    The reference uses ``np.floor(np.log(m) / np.log(base))``
    (``space_filling_curves.py:531``); we reproduce that float arithmetic
    exactly so edge cases at exact powers round identically.
    """
    return int(np.floor(np.log(m) / np.log(base)))


def block_stitch_sfc(sfc, width: int, height: int):
    """Cover a W x H rectangle with stitched power-of-base curve blocks.

    Reference: ``space_filling_curves.py:513-591``.  Returns
    ``(curve, blocked_curve)`` where ``curve`` is the flat ordered cell
    list and ``blocked_curve`` groups cells per block.
    """
    fn = _resolve(sfc)
    base = _block_base(fn)

    blocks: List[Tuple[int, int, int, int]] = []

    def collect(x0: int, y0: int, w: int, h: int) -> None:
        if w <= 0 or h <= 0:
            return
        k = _block_order(min(w, h), base)
        b = base ** k
        blocks.append((x0, y0, b, k))
        collect(x0 + b, y0, w - b, b)
        collect(x0, y0 + b, w, h - b)

    collect(0, 0, width, height)

    # Default (unrotated) entry cell of every block, used as the alignment
    # target when orienting the previous block.
    default_entries: List[Cell] = []
    raw_by_block: List[np.ndarray] = []
    for (bx, by, b, k) in blocks:
        raw = _block_points(fn, k, b)
        raw_by_block.append(raw)
        default_entries.append(
            (bx + math.floor(raw[0, 0]), by + math.floor(raw[0, 1]))
        )

    visited: set = set()
    curve: List[Cell] = []
    blocked: List[List[Cell]] = []
    prev_exit: Cell | None = None

    for idx, (bx, by, b, k) in enumerate(blocks):
        raw = raw_by_block[idx]
        next_entry = default_entries[idx + 1] if idx + 1 < len(blocks) else None
        best_score = math.inf
        best: List[Cell] | None = None
        for sym in get_symmetries(b):
            pts = [
                (bx + math.floor(sym(x, y)[0]), by + math.floor(sym(x, y)[1]))
                for x, y in raw
            ]
            fresh = [p for p in pts if p not in visited]
            if not fresh:
                continue
            score = 0
            if prev_exit is not None:
                score += abs(prev_exit[0] - fresh[0][0]) + abs(prev_exit[1] - fresh[0][1])
            if next_entry is not None:
                score += abs(fresh[-1][0] - next_entry[0]) + abs(fresh[-1][1] - next_entry[1])
            if score < best_score:
                best_score = score
                best = fresh
        assert best is not None, "block produced no new cells"
        visited.update(best)
        curve.extend(best)
        blocked.append(best)
        prev_exit = best[-1]

    return curve, blocked
