"""Patch-embedding tokenizers: image -> curve-ordered token sequence.

TPU-first design notes:
  * Images are **NHWC** (``[B, H, W, C]``), the native TPU conv layout.
    (The reference is NCHW torch; ``sfc_vit_tpu.utils.torch_compat``
    converts at the boundary for parity tests.)
  * Curve reordering is a single static gather with a LUT that is a
    compile-time constant -- XLA folds it into the surrounding
    patchify/projection; the optional Pallas kernel in
    ``sfc_vit_tpu.ops.gather_project`` fuses gather+GEMM explicitly.
  * The reference's fifteen near-clone tokenizer classes
    (SURVEY.md section 2b) collapse into three modules parameterized by
    curve name: :class:`ConvPatchEmbedding` (2D family),
    :class:`PixelCurveEmbedding1D` (1D family), and
    :class:`HierarchicalCurveEmbedding` (multiscale family, in
    ``hierarchical.py``).  ``compat.py`` re-exposes the reference names.

Contract (mirrors ``base_patch_embedding.py:6-21``): ``__call__`` maps
``[B, H, W, C] -> [B, N, D]``; every tokenizer exposes ``n_patches`` and
``embed_dim``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..curves import flat_lut_2d, pixel_lut

__all__ = [
    "ConvPatchEmbedding",
    "PixelCurveEmbedding1D",
    "FusedCurveProjection",
    "patchify",
    "curve_gather",
]


class FusedCurveProjection(nn.Module):
    """Dense-compatible projection fused with the curve gather.

    Creates params named exactly like ``nn.Dense`` (kernel/bias), so a
    tokenizer can switch between the XLA take+matmul path and the Pallas
    fused kernel (``ops/gather_project.py``) without changing its
    checkpoint layout.  ``lut`` has ``n_tokens * group`` entries; input
    rows are gathered, grouped, and projected in one kernel.
    """

    features: int
    lut: tuple  # static tuple of ints
    group: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.gather_project import gather_project

        k = x.shape[-1] * self.group
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        dtype = self.dtype or x.dtype
        return gather_project(
            x.astype(dtype),
            jnp.asarray(np.asarray(self.lut, dtype=np.int32)),
            kernel.astype(dtype),
            bias.astype(dtype),
            group=self.group,
        )


def patchify(x: jnp.ndarray, patch: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B, (H/p)*(W/p), p*p*C] row-major patches.

    Feature order within a patch is (row, col, channel) -- identical to
    the reference einops pattern ``b c (h p1) (w p2) -> b (h w) (p1 p2 c)``.
    """
    b, h, w, c = x.shape
    gh, gw = h // patch, w // patch
    x = x.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, gh * gw, patch * patch * c)


def curve_gather(tokens: jnp.ndarray, lut: np.ndarray) -> jnp.ndarray:
    """Reorder tokens [B, N, D] along axis 1 by a static LUT."""
    return jnp.take(tokens, jnp.asarray(lut), axis=1)


class _FusedConvProjection(nn.Module):
    """Conv-compatible params (kernel [p,p,C,D] + bias) applied as a
    fused gather+GEMM over patchified features.

    A stride-p conv patchify is exactly ``patchify(x, p) @ reshape(W)``;
    keeping the conv kernel shape makes the param tree interchangeable
    with the unfused ``nn.Conv`` path.
    """

    features: int
    patch_size: int
    lut: tuple
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.gather_project import gather_project

        p = self.patch_size
        c = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (p, p, c, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        patches = patchify(x, p)  # features ordered (row, col, chan)
        dtype = self.dtype or x.dtype
        return gather_project(
            patches.astype(dtype),
            jnp.asarray(np.asarray(self.lut, dtype=np.int32)),
            kernel.reshape(p * p * c, self.features).astype(dtype),
            bias.astype(dtype),
        )


class ConvPatchEmbedding(nn.Module):
    """Conv patchify then (optional) curve reorder -- the 2D family.

    Unifies the reference's ``ZigzagEmbedding`` (curve='raster', i.e. no
    reorder; ``_2D/zigzag_embedding.py:5-30``), ``HilbertEmbedding``
    (``_2D/hilbert_embedding.py:9-92``, which uses the *untransformed*
    curve -> ``flat_lut_2d``), and ``RandomEmbedding``
    (``_2D/random_embedding.py:6-37``, fresh permutation every call via
    the 'permute' RNG stream; the reference's missing ``embed_dim``
    attribute bug is fixed here).

    Attributes:
        img_size: input image side (square).
        patch_size: patch side; stride == kernel == patch_size.
        embed_dim: output embedding dim D.
        curve: 'raster' | 'hilbert' | 'z'/'morton' | 'peano' | 'moore' |
            'onion' | 'random'.
    """

    img_size: int
    patch_size: int
    embed_dim: int
    curve: str = "raster"
    fused: bool = False  # fold conv + curve gather into one Pallas GEMM
    dtype: Optional[jnp.dtype] = None

    @property
    def grid_size(self) -> int:
        return self.img_size // self.patch_size

    @property
    def n_patches(self) -> int:
        return self.grid_size ** 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.fused and self.curve not in ("random",):
            lut = (
                flat_lut_2d(self.curve, self.grid_size)
                if self.curve != "raster"
                else np.arange(self.n_patches, dtype=np.int32)
            )
            return _FusedConvProjection(
                features=self.embed_dim, patch_size=self.patch_size,
                lut=tuple(lut.tolist()), dtype=self.dtype, name="proj",
            )(x)
        x = nn.Conv(
            features=self.embed_dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="proj",
        )(x)
        b = x.shape[0]
        x = x.reshape(b, self.n_patches, self.embed_dim)
        if self.curve == "random":
            perm = jax.random.permutation(
                self.make_rng("permute"), self.n_patches
            )
            x = jnp.take(x, perm, axis=1)
        elif self.curve != "raster":
            x = curve_gather(x, flat_lut_2d(self.curve, self.grid_size))
        return x


class PixelCurveEmbedding1D(nn.Module):
    """Pixel-gather-then-project -- the 1D family.

    Pixels are gathered along the curve, chunked into 1-D runs of
    ``patch_size`` pixels, and linearly projected.  Unifies
    ``RasterScan1DEmbedding`` (curve='raster': no gather,
    ``_1D/zigzag_embedding1D.py:5-39``), ``HilbertEmbedding1D`` /
    ``PeanoEmbedding1D`` / ``MooreEmbedding1D`` / ``MortonEmbedding1D``
    (``_1D/*_embedding1D.py``, coordinate-LUT gather collapsed to one
    flat gather), and ``OnionEmbedding1D`` (spiral walk,
    ``_1D/onion_embedding1D.py:35-53``).

    N = H*W / patch_size tokens of dim patch_size*C.
    """

    img_size: int
    patch_size: int
    embed_dim: int
    curve: str = "raster"
    fused: bool = False  # route through the Pallas gather+GEMM kernel
    dtype: Optional[jnp.dtype] = None

    @property
    def n_patches(self) -> int:
        n_pixels = self.img_size * self.img_size
        assert n_pixels % self.patch_size == 0, (
            "Image must be divisible into 1D patches"
        )
        return n_pixels // self.patch_size

    @property
    def n_pixels(self) -> int:
        return self.img_size * self.img_size

    @property
    def grid_size(self) -> int:
        """The curve runs over the PIXEL lattice for this family (the
        1-D patches are curve-consecutive pixel runs), so positional
        tables index it; ``build_posemb`` subsamples the pixel LUT to
        one representative (first) pixel per token."""
        return self.img_size

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)  # row-major pixel sequence
        if self.fused and self.curve != "raster":
            lut = tuple(pixel_lut(self.curve, h, w).tolist())
            return FusedCurveProjection(
                features=self.embed_dim, lut=lut, group=self.patch_size,
                dtype=self.dtype, name="proj",
            )(x)
        if self.curve != "raster":
            x = curve_gather(x, pixel_lut(self.curve, h, w))
        # chunk curve-consecutive pixels into tokens; feature order is
        # (pixel, channel), matching the reference reshape.
        x = x.reshape(b, self.n_patches, self.patch_size * c)
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="proj")(x)
