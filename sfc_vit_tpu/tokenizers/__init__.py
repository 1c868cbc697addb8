"""Tokenizers: image -> curve-ordered token sequences (flax linen).

Three parameterized modules replace the reference's fifteen near-clones
(SURVEY.md section 2b); ``compat`` re-exposes the reference class names.
"""

from .embeddings import (
    ConvPatchEmbedding,
    PixelCurveEmbedding1D,
    curve_gather,
    patchify,
)
from .hierarchical import GroupedCurveEmbedding1D, HierarchicalCurveEmbedding
from . import compat

__all__ = [
    "ConvPatchEmbedding",
    "PixelCurveEmbedding1D",
    "GroupedCurveEmbedding1D",
    "HierarchicalCurveEmbedding",
    "curve_gather",
    "patchify",
    "compat",
]
