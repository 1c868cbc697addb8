"""Hierarchical (multiscale) curve tokenizers.

One module replaces the reference's six near-identical
``Hierarchical*Embedding`` classes (``src/tokenizers/multiscale/*.py``,
diff-verified clones -- SURVEY.md section 2b): per pyramid level ``l`` the
image is cut into ``2^l``-pixel pre-patches, reordered along the curve
over the pre-patch grid, grouped ``g_l`` curve-consecutive pre-patches
per token, and linearly projected; coarser levels are linearly upsampled
to the finest token count, concatenated on features, and fused.

Also fixes the reference's broken ``HierarchicalZigzagEmbedding``
(``multiscale/multi_vanilla.py:7-50`` references an undefined class and
raises NameError on instantiation): curve='raster' here is the working
no-reorder baseline.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..curves import flat_lut
from .embeddings import curve_gather, patchify

__all__ = ["GroupedCurveEmbedding1D", "HierarchicalCurveEmbedding"]


class GroupedCurveEmbedding1D(nn.Module):
    """One pyramid level: pre-patchify, curve reorder, group, project.

    Reference: ``SFCEmbedding1D`` (``multiscale/multi_morton.py:42-87``)
    and its onion/raster clones.  ``curve='raster'`` applies no reorder.
    """

    img_size: int
    pre_patch_size: int
    group_patch_size: int
    embed_dim: int
    curve: str = "raster"
    fused: bool = False  # route through the Pallas gather+GEMM kernel
    dtype: Optional[jnp.dtype] = None

    @property
    def grid_size(self) -> int:
        assert self.img_size % self.pre_patch_size == 0, (
            "Image size must be divisible by pre_patch_size"
        )
        return self.img_size // self.pre_patch_size

    @property
    def n_pre_patches(self) -> int:
        return self.grid_size ** 2

    @property
    def n_final_patches(self) -> int:
        return self.n_pre_patches // self.group_patch_size

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b = x.shape[0]
        c = x.shape[-1]
        x = patchify(x, self.pre_patch_size)  # [B, grid^2, p*p*C]
        if self.fused and self.curve != "raster":
            from .embeddings import FusedCurveProjection

            lut = tuple(flat_lut(self.curve, self.grid_size).tolist())
            return FusedCurveProjection(
                features=self.embed_dim, lut=lut,
                group=self.group_patch_size, dtype=self.dtype, name="proj",
            )(x)
        if self.curve != "raster":
            x = curve_gather(x, flat_lut(self.curve, self.grid_size))
        # group g curve-consecutive pre-patches per token
        x = x.reshape(
            b,
            self.n_final_patches,
            self.group_patch_size * self.pre_patch_size ** 2 * c,
        )
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="proj")(x)


def _linear_upsample_tokens(x: jnp.ndarray, target_len: int) -> jnp.ndarray:
    """Linear interpolation along the token axis, half-pixel centers.

    Matches ``F.interpolate(mode='linear', align_corners=False)`` used at
    ``multiscale/multi_morton.py:34-37`` (jax.image 'linear' uses the same
    half-pixel convention).
    """
    b, n, d = x.shape
    if n == target_len:
        return x
    return jax.image.resize(x, (b, target_len, d), method="linear")


class HierarchicalCurveEmbedding(nn.Module):
    """Multi-scale curve pyramid tokenizer.

    Reference: ``HierarchicalMortonEmbedding`` et al.
    (``multiscale/multi_morton.py:9-39``).  Exposes the hierarchical
    contract consumed by ``HierarchicalVisionTransformer1D``:
    ``depth``, ``patch_list``, ``n_patches``, ``embed_dim``.

    ``return_levels=True`` emits the per-level token lists *without*
    upsample/fusion -- the interface ``HierarchicalVisionTransformer1D``
    expects (the reference's fused-tensor/list mismatch at
    ``vit.py:538-543`` is fixed by making this explicit).
    """

    img_size: int
    patch_size_list: Sequence[int]
    embed_dim: int  # per-level embedding dim D
    curve: str = "raster"
    return_levels: bool = False
    fused: bool = False
    dtype: Optional[jnp.dtype] = None

    @property
    def pre_patch_sizes(self) -> List[int]:
        return [2 ** i for i in range(len(self.patch_size_list))]

    @property
    def patch_list(self) -> List[int]:
        # Exact per-level token counts (grid^2 // g).  The reference
        # computes ((img//pre) // sqrt(g))**2 (multi_morton.py:21-22),
        # which only equals this for perfect-square group sizes -- its
        # shipped configs all use them, so parity is unaffected.
        return [
            (self.img_size // pre) ** 2 // g
            for pre, g in zip(self.pre_patch_sizes, self.patch_size_list)
        ]

    @property
    def depth(self) -> int:
        return len(self.patch_size_list)

    @property
    def n_patches(self) -> int:
        return self.patch_list[0]

    @property
    def out_dim(self) -> int:
        """Fused embedding dim (the reference exposes this as embed_dim)."""
        return self.embed_dim * self.depth

    @nn.compact
    def __call__(
        self, x: jnp.ndarray
    ) -> Union[jnp.ndarray, List[jnp.ndarray]]:
        levels = []
        for i, g in enumerate(self.patch_size_list):
            levels.append(
                GroupedCurveEmbedding1D(
                    img_size=self.img_size,
                    pre_patch_size=self.pre_patch_sizes[i],
                    group_patch_size=g,
                    embed_dim=self.embed_dim,
                    curve=self.curve,
                    fused=self.fused,
                    dtype=self.dtype,
                    name=f"level_{i}",
                )(x)
            )
        if self.return_levels:
            return levels
        n_tokens = self.patch_list[0]
        levels = [levels[0]] + [
            _linear_upsample_tokens(t, n_tokens) for t in levels[1:]
        ]
        fused = jnp.concatenate(levels, axis=-1)  # [B, n_tokens, D*depth]
        return nn.Dense(self.out_dim, dtype=self.dtype, name="fusion")(fused)
