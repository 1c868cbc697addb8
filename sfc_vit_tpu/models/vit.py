"""Family A models: the reference ``src/models/vit.py`` architectures.

``VisionTransformer`` (2D tokenizer -> post-norm encoder -> factorized
head, ``vit.py:325-385``), ``VisionTransformer1D`` (adds a MixerBlock
front end, ``vit.py:392-458``) and ``HierarchicalVisionTransformer1D``
(per-level encoders + fusion encoder, ``vit.py:465-545``).

All forwards map [B, H, W, C] -> [B, num_classes].  As in the reference,
the stock models apply **no** CLS token and **no** positional encoding
(``posemb='none'``); other kinds from ``posemb.py`` are opt-in.

Documented divergences (reference is broken as shipped, SURVEY.md 2c):
  * ``HierarchicalVisionTransformer1D`` construction fails in the
    reference (MixerBlock arity TypeError) and its forward expects a list
    where tokenizers return a tensor; here the tokenizer is built with
    ``return_levels=True`` and the head's ``seq_len`` is the *total*
    token count after level concatenation.
  * Per-level encoder width is the per-level dim D (the reference passes
    the fused D*depth, which cannot match the level tensors).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .layers import MixerBlock, MultiLayerPredictor, TransformerSeqEncoder
from .posemb import build_posemb

__all__ = [
    "VisionTransformer",
    "VisionTransformer1D",
    "HierarchicalVisionTransformer1D",
]


def _token_dim(tok) -> int:
    return tok.out_dim if hasattr(tok, "out_dim") else tok.embed_dim


def _apply_posemb(x, kind, curve, grid, module):
    if kind == "none":
        return x
    if kind == "learned":
        table = module.param(
            "pos_embed",
            nn.initializers.normal(stddev=0.02),
            (x.shape[1], x.shape[2]),
        )
        return x + table.astype(x.dtype)
    table = build_posemb(kind, x.shape[1], x.shape[2], curve=curve, grid=grid)
    return x + jnp.asarray(table, dtype=x.dtype)


class VisionTransformer(nn.Module):
    """tokenizer -> TransformerSeqEncoder -> MultiLayerPredictor.

    Reference ``VisionTransformer`` (``vit.py:325-385``); the head
    attends all tokens via the factorized linear (no CLS / mean pool).
    """

    patch_embed: nn.Module
    depth: int = 6
    n_heads: int = 4
    mlp_dim: int = 256
    num_classes: int = 10
    dropout_rate: float = 0.1
    posemb: str = "none"
    remat: bool = False
    dtype: Optional[jnp.dtype] = None
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        tok = self.patch_embed
        x = tok(x)  # [B, N, D]
        x = _apply_posemb(x, self.posemb, getattr(tok, "curve", None),
                          getattr(tok, "grid_size", None), self)
        x = TransformerSeqEncoder(
            dim=_token_dim(tok),
            n_heads=self.n_heads,
            hidden_dim=self.mlp_dim,
            n_layers=self.depth,
            dropout_rate=self.dropout_rate,
            remat=self.remat,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            name="encoder",
        )(x, deterministic=deterministic)
        return MultiLayerPredictor(
            embed_dim=_token_dim(tok),
            seq_len=tok.n_patches,
            n_layers=2,
            num_classes=self.num_classes,
            dtype=self.dtype,
            name="mlp_head",
        )(x, deterministic=deterministic)


class VisionTransformer1D(nn.Module):
    """tokenizer -> MixerBlock -> encoder -> head.

    Reference ``VisionTransformer1D`` (``vit.py:392-458``) -- the
    flagship configuration of ``main.py:276-282`` pairs this with the
    hierarchical Morton tokenizer.
    """

    patch_embed: nn.Module
    depth: int = 6
    n_heads: int = 4
    mlp_dim: int = 256
    num_classes: int = 10
    dropout_rate: float = 0.1
    posemb: str = "none"
    remat: bool = False
    dtype: Optional[jnp.dtype] = None
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        tok = self.patch_embed
        dim = _token_dim(tok)
        x = tok(x)  # [B, N, D]
        x = _apply_posemb(x, self.posemb, getattr(tok, "curve", None),
                          getattr(tok, "grid_size", None), self)
        x = MixerBlock(
            seq_len=tok.n_patches,
            embed_dim=dim,
            hidden_dim=dim * 2,
            out_dim=dim,
            dtype=self.dtype,
            name="mlp_mixer",
        )(x)
        x = TransformerSeqEncoder(
            dim=dim,
            n_heads=self.n_heads,
            hidden_dim=self.mlp_dim,
            n_layers=self.depth,
            dropout_rate=self.dropout_rate,
            remat=self.remat,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            name="encoder",
        )(x, deterministic=deterministic)
        return MultiLayerPredictor(
            embed_dim=dim,
            seq_len=tok.n_patches,
            n_layers=2,
            dropout_rate=0.5,
            num_classes=self.num_classes,
            dtype=self.dtype,
            name="mlp_head",
        )(x, deterministic=deterministic)


class HierarchicalVisionTransformer1D(nn.Module):
    """One encoder per pyramid level + fusion encoder + mixing head.

    Reference ``HierarchicalVisionTransformer1D`` (``vit.py:465-545``),
    repaired as described in the module docstring.  ``patch_embed`` must
    be a ``HierarchicalCurveEmbedding`` with ``return_levels=True``.
    """

    patch_embed: nn.Module
    depth: int = 6
    n_heads: int = 4
    mlp_dim: int = 256
    num_classes: int = 10
    dropout_rate: float = 0.1
    remat: bool = False
    dtype: Optional[jnp.dtype] = None
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        tok = self.patch_embed
        assert getattr(tok, "return_levels", False), (
            "HierarchicalVisionTransformer1D needs a hierarchical tokenizer "
            "built with return_levels=True"
        )
        dim = tok.embed_dim  # per-level dim
        levels = tok(x)  # list of [B, N_i, D]
        encoded = []
        for i, lvl in enumerate(levels):
            encoded.append(
                TransformerSeqEncoder(
                    dim=dim,
                    n_heads=self.n_heads,
                    hidden_dim=self.mlp_dim,
                    n_layers=self.depth,
                    dropout_rate=self.dropout_rate,
                    remat=self.remat,
                    dtype=self.dtype,
                    attn_impl=self.attn_impl,
                    name=f"encoder_{i}",
                )(lvl, deterministic=deterministic)
            )
        x = jnp.concatenate(encoded, axis=1)  # [B, sum(N_i), D]
        x = TransformerSeqEncoder(
            dim=dim,
            n_heads=self.n_heads,
            hidden_dim=self.mlp_dim,
            n_layers=2,
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            name="fusion_encoder",
        )(x, deterministic=deterministic)
        total_tokens = int(sum(tok.patch_list))
        return MultiLayerPredictor(
            embed_dim=dim,
            seq_len=total_tokens,
            n_layers=2,
            dropout_rate=0.5,
            num_classes=self.num_classes,
            mix=True,
            dtype=self.dtype,
            name="mlp_head",
        )(x, deterministic=deterministic)
