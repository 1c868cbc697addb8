"""Shared helpers for the Pallas TPU kernels (single source of truth).

Mosaic keeps per-row scalars (softmax max / sum / LSE) lane-replicated
in [rows, 128] tiles; ``lane_bcast`` adapts that layout to an arbitrary
tile width.  ``round_up`` is the usual padding helper.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["LANES", "NEG_INF", "lane_bcast", "round_up"]

LANES = 128
NEG_INF = -1e30


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def lane_bcast(x, width: int):
    """Broadcast a [rows, 128] lane-replicated value to [rows, width]."""
    if width == LANES:
        return x
    if width < LANES:
        return x[:, :width]
    reps, rem = divmod(width, LANES)
    assert rem == 0, f"width {width} not a multiple of {LANES}"
    return jnp.tile(x, (1, reps))
