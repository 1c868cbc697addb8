"""Curve retrofit of a pretrained (torchvision-style) ViT.

First-class port of the reference's ``notebooks/pretrained_ViT.ipynb``
monkey-patch: a standard CLS-token ViT (conv patchify, learned
positional embeddings, pre-norm encoder) whose patch tokens are gathered
along a space-filling curve *before* the CLS prepend, with either the
original learned positional table (optionally bilinearly resized for a
different input resolution, notebook cell 3
``resize_positional_embeddings``) or the GFPE curve encoding with a zero
CLS row (cell 3 ``build_hilbert_pe``), and a swappable classification
head (cell 3: 257-way for Caltech-256).

Weights import from a torchvision ``vit_b_16`` state_dict via
:func:`load_torchvision_vit` -- local file only (this framework assumes
no network egress).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..curves import flat_lut_2d
from ..tokenizers.embeddings import curve_gather
from .layers import TorchMultiHeadAttention
from .posemb import gfpe

__all__ = [
    "RetrofitViT",
    "load_torchvision_vit",
    "resize_pos_embedding",
    "synthetic_torchvision_state_dict",
]


def synthetic_torchvision_state_dict(
    dim: int = 64, depth: int = 2, mlp: int = 128, patch: int = 16,
    grid: int = 4, classes: int = 10, seed: int = 0,
) -> Dict[str, np.ndarray]:
    """Random weights in the torchvision ``vit_b_16`` state_dict layout.

    Smoke-mode stand-in for a real checkpoint on zero-egress machines
    (scripts/retrofit_finetune.py --synthetic-weights); same key schema
    ``load_torchvision_vit`` parses.
    """
    rng = np.random.default_rng(seed)
    r = lambda *s: rng.standard_normal(s).astype(np.float32) * 0.02
    sd: Dict[str, np.ndarray] = {
        "class_token": r(1, 1, dim),
        "conv_proj.weight": r(dim, 3, patch, patch),
        "conv_proj.bias": r(dim),
        "encoder.pos_embedding": r(1, grid * grid + 1, dim),
        "encoder.ln.weight": np.ones(dim, np.float32),
        "encoder.ln.bias": np.zeros(dim, np.float32),
        "heads.head.weight": r(classes, dim),
        "heads.head.bias": r(classes),
    }
    for i in range(depth):
        p = f"encoder.layers.encoder_layer_{i}"
        sd.update({
            f"{p}.ln_1.weight": np.ones(dim, np.float32),
            f"{p}.ln_1.bias": np.zeros(dim, np.float32),
            f"{p}.ln_2.weight": np.ones(dim, np.float32),
            f"{p}.ln_2.bias": np.zeros(dim, np.float32),
            f"{p}.self_attention.in_proj_weight": r(3 * dim, dim),
            f"{p}.self_attention.in_proj_bias": r(3 * dim),
            f"{p}.self_attention.out_proj.weight": r(dim, dim),
            f"{p}.self_attention.out_proj.bias": r(dim),
            f"{p}.mlp.linear_1.weight": r(mlp, dim),
            f"{p}.mlp.linear_1.bias": r(mlp),
            f"{p}.mlp.linear_2.weight": r(dim, mlp),
            f"{p}.mlp.linear_2.bias": r(dim),
        })
    return sd


class _EncoderBlock(nn.Module):
    """torchvision EncoderBlock: pre-norm MHA + pre-norm GELU MLP."""

    dim: int
    n_heads: int
    mlp_dim: int
    dtype: Optional[jnp.dtype] = None
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln_1")(x)
        h = TorchMultiHeadAttention(
            dim=self.dim, n_heads=self.n_heads, dtype=self.dtype,
            attn_impl=self.attn_impl, name="self_attention",
        )(h)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln_2")(x)
        h = nn.Dense(self.mlp_dim, dtype=self.dtype, name="mlp_1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, name="mlp_2")(h)
        return x + h


class RetrofitViT(nn.Module):
    """CLS-token ViT with curve-reordered patch tokens.

    forward: conv_proj -> [B, N, D] -> curve gather -> prepend CLS ->
    + pos-emb -> pre-norm encoder -> head(CLS), matching the notebook's
    ``my_forward`` (cell 3).
    """

    image_size: int = 224
    patch_size: int = 16
    dim: int = 768
    depth: int = 12
    n_heads: int = 12
    mlp_dim: int = 3072
    num_classes: int = 1000
    curve: str = "hilbert"
    posemb: str = "learned"  # 'learned' | 'gfpe'
    gfpe_temperature: float = 4.0
    gfpe_h_param: float = 3.0
    dtype: Optional[jnp.dtype] = None
    attn_impl: str = "auto"

    @property
    def grid_size(self) -> int:
        return self.image_size // self.patch_size

    @property
    def n_patches(self) -> int:
        return self.grid_size ** 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        del deterministic
        b = x.shape[0]
        x = nn.Conv(
            features=self.dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="conv_proj",
        )(x)
        x = x.reshape(b, self.n_patches, self.dim)
        if self.curve != "raster":
            # The notebook reorders via the untransformed-Hilbert flat LUT
            # over the conv patch grid -> flat_lut_2d convention.
            x = curve_gather(x, flat_lut_2d(self.curve, self.grid_size))

        cls = self.param(
            "class_token", nn.initializers.zeros, (1, 1, self.dim)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, self.dim)).astype(x.dtype), x],
            axis=1,
        )

        if self.posemb == "learned":
            table = self.param(
                "pos_embedding",
                nn.initializers.normal(stddev=0.02),
                (1, self.n_patches + 1, self.dim),
            )
            x = x + table.astype(x.dtype)
        elif self.posemb == "gfpe":
            positions = flat_lut_2d(self.curve, self.grid_size).astype(
                np.float32
            )
            pe = gfpe(positions, self.dim, self.gfpe_temperature,
                      self.gfpe_h_param)
            pe = np.concatenate(
                [np.zeros((1, self.dim), np.float32), pe], axis=0
            )  # zero CLS row (notebook cell 3)
            x = x + jnp.asarray(pe, dtype=x.dtype)
        else:
            raise ValueError(f"unknown posemb {self.posemb!r}")

        for i in range(self.depth):
            x = _EncoderBlock(
                dim=self.dim, n_heads=self.n_heads, mlp_dim=self.mlp_dim,
                dtype=self.dtype, attn_impl=self.attn_impl,
                name=f"encoder_layer_{i}",
            )(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln")(x)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="head")(
            x[:, 0]
        )


def resize_pos_embedding(
    table: np.ndarray, new_grid: int
) -> np.ndarray:
    """Bilinear-resize a (1, 1+g*g, D) CLS pos-emb table to a new grid.

    Notebook cell 3 ``resize_positional_embeddings`` (14x14 -> 8x8 for
    128x128 inputs).
    """
    cls_row, grid_part = table[:, :1], table[:, 1:]
    g = int(math.isqrt(grid_part.shape[1]))
    d = grid_part.shape[-1]
    grid_part = grid_part.reshape(1, g, g, d)
    resized = jax.image.resize(
        jnp.asarray(grid_part), (1, new_grid, new_grid, d), method="bilinear"
    )
    resized = np.asarray(resized).reshape(1, new_grid * new_grid, d)
    return np.concatenate([cls_row, resized], axis=1)


#: Head counts for torchvision ViT widths whose head_dim is not 64
#: (vit_h_14 uses 16 heads of dim 80); everything else infers dim // 64.
_TORCHVISION_HEADS = {1280: 16}


def load_torchvision_vit(
    state_dict: Dict[str, Any],
    image_size: int = 224,
    num_classes: Optional[int] = None,
    curve: str = "hilbert",
    posemb: str = "learned",
    n_heads: Optional[int] = None,
    dtype=None,
    attn_impl: str = "auto",
    rng: Optional[jax.Array] = None,
) -> Tuple[RetrofitViT, Dict[str, Any]]:
    """Build a RetrofitViT + flax params from a torchvision ViT state_dict.

    Accepts tensors or numpy arrays.  Handles both torchvision MLP key
    layouts (``mlp.linear_1`` and ``mlp.0``).  When ``num_classes``
    differs from the checkpoint head, the head is re-initialized
    (notebook cell 3's head swap); when ``image_size`` implies a
    different grid, the learned positional table is bilinearly resized.
    """

    def g(key):
        v = state_dict[key]
        return v if isinstance(v, np.ndarray) else np.asarray(
            v.detach().cpu().float().numpy() if hasattr(v, "detach") else v
        )

    def has(key):
        return key in state_dict

    dim = g("class_token").shape[-1]
    depth = 0
    while has(f"encoder.layers.encoder_layer_{depth}.ln_1.weight"):
        depth += 1
    mlp_key = (
        "mlp.linear_1"
        if has("encoder.layers.encoder_layer_0.mlp.linear_1.weight")
        else "mlp.0"
    )
    mlp_key2 = "mlp.linear_2" if mlp_key == "mlp.linear_1" else "mlp.3"
    mlp_dim = g(f"encoder.layers.encoder_layer_0.{mlp_key}.weight").shape[0]
    patch = g("conv_proj.weight").shape[-1]
    ckpt_classes = g("heads.head.weight").shape[0]
    if n_heads is None:
        # Head count is not recoverable from the packed weights; infer
        # from known torchvision widths, else assume head_dim 64.
        n_heads = _TORCHVISION_HEADS.get(dim, dim // 64)

    model = RetrofitViT(
        image_size=image_size, patch_size=patch, dim=dim, depth=depth,
        n_heads=n_heads, mlp_dim=mlp_dim,
        num_classes=num_classes or ckpt_classes, curve=curve,
        posemb=posemb, dtype=dtype, attn_impl=attn_impl,
    )

    params: Dict[str, Any] = {
        "conv_proj": {
            "kernel": np.transpose(g("conv_proj.weight"), (2, 3, 1, 0)),
            "bias": g("conv_proj.bias"),
        },
        "class_token": g("class_token"),
        "ln": {"scale": g("encoder.ln.weight"), "bias": g("encoder.ln.bias")},
    }
    if posemb == "learned":
        table = g("encoder.pos_embedding")
        new_grid = image_size // patch
        old_grid = int(math.isqrt(table.shape[1] - 1))
        if new_grid != old_grid:
            table = resize_pos_embedding(table, new_grid)
        params["pos_embedding"] = table
    for i in range(depth):
        pre = f"encoder.layers.encoder_layer_{i}"
        params[f"encoder_layer_{i}"] = {
            "ln_1": {"scale": g(f"{pre}.ln_1.weight"),
                     "bias": g(f"{pre}.ln_1.bias")},
            "ln_2": {"scale": g(f"{pre}.ln_2.weight"),
                     "bias": g(f"{pre}.ln_2.bias")},
            "self_attention": {
                "in_proj": {
                    "kernel": g(f"{pre}.self_attention.in_proj_weight").T,
                    "bias": g(f"{pre}.self_attention.in_proj_bias"),
                },
                "out_proj": {
                    "kernel": g(f"{pre}.self_attention.out_proj.weight").T,
                    "bias": g(f"{pre}.self_attention.out_proj.bias"),
                },
            },
            "mlp_1": {"kernel": g(f"{pre}.{mlp_key}.weight").T,
                      "bias": g(f"{pre}.{mlp_key}.bias")},
            "mlp_2": {"kernel": g(f"{pre}.{mlp_key2}.weight").T,
                      "bias": g(f"{pre}.{mlp_key2}.bias")},
        }
    if num_classes is None or num_classes == ckpt_classes:
        params["head"] = {
            "kernel": g("heads.head.weight").T,
            "bias": g("heads.head.bias"),
        }
    else:
        rng = rng if rng is not None else jax.random.key(0)
        params["head"] = {
            "kernel": np.asarray(
                nn.initializers.lecun_normal()(rng, (dim, num_classes))
            ),
            "bias": np.zeros((num_classes,), np.float32),
        }
    return model, params
