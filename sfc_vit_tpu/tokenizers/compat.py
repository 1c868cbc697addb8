"""Reference-named tokenizer factories (API-parity layer).

The reference ships fifteen tokenizer classes (SURVEY.md section 2b);
here each name maps onto one of the three parameterized modules.
Signatures mirror the reference constructors; ``in_channels`` is accepted
for parity but inferred from the input at call time (flax lazy init).
"""

from __future__ import annotations

from typing import Sequence

from .embeddings import ConvPatchEmbedding, PixelCurveEmbedding1D
from .hierarchical import GroupedCurveEmbedding1D, HierarchicalCurveEmbedding

__all__ = [
    "ZigzagEmbedding",
    "HilbertEmbedding",
    "RandomEmbedding",
    "RasterScan1DEmbedding",
    "HilbertEmbedding1D",
    "PeanoEmbedding1D",
    "MooreEmbedding1D",
    "MortonEmbedding1D",
    "OnionEmbedding1D",
    "SFCEmbedding1D",
    "HierarchicalHilbertEmbedding",
    "HierarchicalPeanoEmbedding",
    "HierarchicalMooreEmbedding",
    "HierarchicalMortonEmbedding",
    "HierarchicalOnionEmbedding",
    "HierarchicalRasterScanEmbedding",
    "HierarchicalZigzagEmbedding",
]


def _conv2d(curve: str):
    def make(img_size: int, patch_size: int, in_channels: int = 3,
             embed_dim: int = 256, **kw) -> ConvPatchEmbedding:
        del in_channels
        return ConvPatchEmbedding(
            img_size=img_size, patch_size=patch_size, embed_dim=embed_dim,
            curve=curve, **kw,
        )
    return make


def _pixel1d(curve: str):
    def make(img_size: int, patch_size: int, in_channels: int = 3,
             embed_dim: int = 256, **kw) -> PixelCurveEmbedding1D:
        del in_channels
        return PixelCurveEmbedding1D(
            img_size=img_size, patch_size=patch_size, embed_dim=embed_dim,
            curve=curve, **kw,
        )
    return make


def _hier(curve: str):
    def make(img_size: int, in_channels: int = 3,
             patch_size_list: Sequence[int] = (16, 4, 1),
             embed_dim: int = 256, **kw) -> HierarchicalCurveEmbedding:
        del in_channels
        return HierarchicalCurveEmbedding(
            img_size=img_size, patch_size_list=tuple(patch_size_list),
            embed_dim=embed_dim, curve=curve, **kw,
        )
    return make


# --- 2D family (``src/tokenizers/_2D``) ---
ZigzagEmbedding = _conv2d("raster")
HilbertEmbedding = _conv2d("hilbert")
RandomEmbedding = _conv2d("random")  # embed_dim bug in the reference fixed

# --- 1D family (``src/tokenizers/_1D``) ---
RasterScan1DEmbedding = _pixel1d("raster")
HilbertEmbedding1D = _pixel1d("hilbert")
PeanoEmbedding1D = _pixel1d("peano")
MooreEmbedding1D = _pixel1d("moore")
MortonEmbedding1D = _pixel1d("morton")
OnionEmbedding1D = _pixel1d("onion")

# --- multiscale family (``src/tokenizers/multiscale``) ---
SFCEmbedding1D = GroupedCurveEmbedding1D
HierarchicalHilbertEmbedding = _hier("hilbert")
HierarchicalPeanoEmbedding = _hier("peano")
HierarchicalMooreEmbedding = _hier("moore")
HierarchicalMortonEmbedding = _hier("morton")
HierarchicalOnionEmbedding = _hier("onion")
HierarchicalRasterScanEmbedding = _hier("raster")
# The reference's multi_vanilla.py is broken (NameError); 'raster' is the
# working conv-free baseline it intended.
HierarchicalZigzagEmbedding = _hier("raster")
