"""Positional-embedding registry, remapped along space-filling curves.

The reference's four positional treatments (SURVEY.md section 7.4):
  * ``"none"``     -- the stock ``vit.py`` models use no positional
                      encoding at all (everything commented out,
                      ``vit.py:207-219,237-240``).
  * ``"sincos1d"`` -- Vaswani sin/cos table (``altvit.py:16-41``),
                      indexed by *sequence position* (so curve order is
                      implicit).
  * ``"gfpe"``     -- the GFPE-style Hilbert encoding of ``HilbertViT``
                      (``altvit.py:236-251``): position is the curve's
                      *flat grid index*, hyperparams T=4, h=3.0.
  * ``"learned"``  -- a learned table (the commented-out
                      ``nn.Parameter`` variant, ``vit.py:207``).

All tables are host-precomputed numpy -> compile-time constants, except
"learned" which is a flax param created by the model.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

from ..curves import flat_lut

__all__ = ["sincos_1d", "gfpe", "build_posemb"]


def sincos_1d(
    n_pos: int, dim: int, temperature: float = 10000.0
) -> np.ndarray:
    """Vaswani sinusoidal 1-D table, (n_pos, dim) float32.

    Interleaved sin (even dims) / cos (odd dims), matching
    ``posemb_sincos_1d`` (``altvit.py:16-41``).
    """
    assert dim % 2 == 0, "embedding dim must be even"
    pos = np.arange(n_pos, dtype=np.float32)[:, None]
    div = np.exp(
        np.arange(0, dim, 2, dtype=np.float32) * (-math.log(temperature) / dim)
    )
    pe = np.zeros((n_pos, dim), dtype=np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


def gfpe(
    positions: np.ndarray,
    dim: int,
    temperature: float = 4.0,
    h_param: float = 3.0,
) -> np.ndarray:
    """GFPE-style curve positional encoding, (n, dim) float32.

    For curve flat-index ``pos`` and frequency index ``i``:
        arg = (2 i N^2 pos 2pi) / (T n d) + h (2 i pos 2pi) / d
        pe  = [sin(arg) || cos(arg)]
    with N = sqrt(n) the grid side -- reference ``HilbertViT.__init__``
    (``altvit.py:236-251``), defaults T=4, h=3.0.

    The reference always builds the table over the full N x N grid, so
    ``N^2 == n`` identically and the first term's N^2/n factor is
    exactly 1; we use ``n`` in its place, which is bit-identical there
    and extends the formula to non-square position sets (grouped/1-D
    tokenizers, where ``positions`` are each token's representative
    curve flat index -- see :func:`build_posemb`).
    """
    assert dim % 2 == 0, "embedding dim must be even"
    pos = np.asarray(positions, dtype=np.float32)[:, None]  # (n, 1)
    n = pos.shape[0]
    i_ar = np.arange(dim // 2, dtype=np.float32)[None, :]  # (1, d/2)
    two_pi = 2.0 * math.pi
    scale = (2.0 * i_ar * n * pos * two_pi) / (
        temperature * n * dim
    )
    phase = h_param * (2.0 * i_ar * pos * two_pi) / dim
    arg = scale + phase
    return np.concatenate([np.sin(arg), np.cos(arg)], axis=1).astype(
        np.float32
    )


def build_posemb(
    kind: str,
    n_pos: int,
    dim: int,
    curve: Optional[str] = None,
    grid: Optional[int] = None,
    temperature: float = 4.0,
    h_param: float = 3.0,
) -> Optional[np.ndarray]:
    """Build a positional table, or None for 'none'/'learned'.

    For 'gfpe', positions are the curve's flat LUT values over ``grid``
    (identity raster positions when no curve is given).  The table
    always has exactly ``n_pos`` rows: when the curve LUT is finer than
    the token sequence (grouped/1-D tokenizers, where ``grid`` is the
    pre-grouping pixel/patch lattice, so the LUT has ``k * n_pos``
    entries), each token takes its FIRST curve cell's flat index as its
    representative position.
    """
    if kind in ("none", "learned"):
        return None
    if kind == "sincos1d":
        return sincos_1d(n_pos, dim)
    if kind == "gfpe":
        if curve == "random":
            raise ValueError(
                "gfpe is undefined for curve='random' (the per-call "
                "shuffle has no static curve order to encode)"
            )
        if curve is not None and curve != "raster":
            if grid is None:
                g = int(math.isqrt(n_pos))
                if g * g != n_pos:
                    raise ValueError(
                        f"gfpe over curve {curve!r}: n_pos={n_pos} is not "
                        "a perfect square and the tokenizer exposes no "
                        "grid_size; pass grid= explicitly"
                    )
                grid = g
            lut = flat_lut(curve, grid).astype(np.float32)
            if lut.shape[0] != n_pos:
                if lut.shape[0] % n_pos != 0:
                    raise ValueError(
                        f"gfpe over curve {curve!r}: grid {grid} gives "
                        f"{lut.shape[0]} curve cells, not a multiple of "
                        f"n_pos={n_pos}"
                    )
                lut = lut[:: lut.shape[0] // n_pos]  # token's first cell
            positions = lut
        else:
            positions = np.arange(n_pos, dtype=np.float32)
        return gfpe(positions, dim, temperature=temperature, h_param=h_param)
    raise ValueError(f"unknown positional embedding kind {kind!r}")
