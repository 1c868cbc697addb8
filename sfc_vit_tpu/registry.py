"""Declarative model/tokenizer registry.

The reference configures experiments by commenting dict entries in and
out (``main.py:232-250``); here curve x tokenizer-family x model is a
first-class config: ``build_model(ModelConfig(...))`` -> flax module.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Union

from .curves import CURVE_REGISTRY
from .models import (
    CurveViT,
    HierarchicalVisionTransformer1D,
    SimpleViT,
    VisionTransformer,
    VisionTransformer1D,
)
from .tokenizers import (
    ConvPatchEmbedding,
    HierarchicalCurveEmbedding,
    PixelCurveEmbedding1D,
)

__all__ = ["ModelConfig", "build_tokenizer", "build_model", "PRESETS",
           "preset_config", "TOKENIZER_FAMILIES", "MODEL_FAMILIES"]

TOKENIZER_FAMILIES = ("2d", "1d", "hierarchical")
MODEL_FAMILIES = ("vit", "vit1d", "hier", "simple", "curvevit")


@dataclasses.dataclass
class ModelConfig:
    """curve + tokenizer + model size in, model out (BASELINE.json API)."""

    model: str = "vit1d"          # one of MODEL_FAMILIES
    tokenizer: str = "hierarchical"  # one of TOKENIZER_FAMILIES
    curve: str = "morton"
    img_size: int = 32
    patch_size: int = 4
    patch_size_list: Sequence[int] = (16, 4, 1)
    embed_dim: int = 256
    depth: int = 8
    n_heads: int = 4
    mlp_dim: int = 512
    dim_head: int = 64
    num_classes: int = 10
    posemb: str = "none"          # family-A positional registry
    remat: bool = False           # jax.checkpoint encoder layers
    fused: bool = False           # Pallas fused gather+GEMM tokenizers
    dtype: Optional[str] = None   # e.g. "bfloat16"
    #: a single implementation for every layer, or (family B models
    #: 'simple'/'curvevit' only) a per-layer schedule of length
    #: ``depth`` — e.g. ``('local','local','local','auto')`` for a
    #: hybrid local/global long-context stack (see
    #: models.simple_vit._impl_schedule for the measured motivation)
    attn_impl: Union[str, Sequence[str]] = "auto"
    #: curve-pair token merging (model 'curvevit' only): merge after
    #: these 1-based layer indices.  Measured recommendation
    #: (results/r4_token_merge_ab.json): (1,) at ratio 0.5 for
    #: >=1k-token models — +23.1% img/s at 4k / +11.0% at 1k, zero
    #: accuracy cost; merging late never pays.
    merge_layers: Sequence[int] = ()
    merge_ratio: float = 0.5

    def jax_dtype(self):
        import jax.numpy as jnp

        return None if self.dtype is None else jnp.dtype(self.dtype)


#: Named operating points (BASELINE.json configs + standard ViT sizes).
PRESETS = {
    # the reference's main.py flagship (main.py:269-314)
    "flagship": dict(model="vit1d", tokenizer="hierarchical", curve="morton",
                     img_size=32, patch_size_list=(16, 4, 1), embed_dim=256,
                     depth=8, n_heads=4, mlp_dim=512),
    # hilbert.ipynb notebook comparison setup
    "notebook": dict(model="vit", tokenizer="2d", curve="hilbert",
                     img_size=32, patch_size=4, embed_dim=256, depth=6,
                     n_heads=4, mlp_dim=256),
    "vit-tiny-4": dict(model="curvevit", img_size=32, patch_size=4,
                       embed_dim=192, depth=12, n_heads=3, mlp_dim=768),
    "vit-s-16": dict(model="curvevit", img_size=224, patch_size=16,
                     embed_dim=384, depth=12, n_heads=6, mlp_dim=1536),
    "vit-b-16": dict(model="curvevit", img_size=224, patch_size=16,
                     embed_dim=768, depth=12, n_heads=12, mlp_dim=3072),
    # long-context operating point: pixel tokenization along the curve
    # at 128x128 -> 16,384 tokens (the reference's 1D-pixel thesis
    # geometry scaled up); streaming flash + the measured token-merge
    # winner (results/r4_token_merge_ab.json,
    # results/r4_longctx_train.json).  remat measured a flat 21-27%
    # training LOSS at batch <= 8 (results/r4_longctx_tune.json: the
    # recomputed attention forwards, with activations nowhere near
    # HBM) — turn it on only when a bigger batch/depth actually OOMs.
    # Merge-on default validated OFF the ceiling in round 5 (VERDICT
    # r4 item 2): merge0.5 costs -0.8% +/- 1.1% on the non-saturating
    # texture-hard control (results/r5_merge_texture_4k.json) and
    # 0.000 on the cross-site relational-v2 control
    # (results/r5_merge_relational_4k.json — merging does NOT destroy
    # the two-site signal).
    "longctx-16k": dict(model="curvevit", curve="hilbert", img_size=128,
                        patch_size=1, embed_dim=384, depth=4, n_heads=6,
                        mlp_dim=1536, dtype="bfloat16",
                        merge_layers=(1,), merge_ratio=0.5),
    # hybrid local/global schedule at the same geometry: curve-local
    # windows in 3 of 4 layers (5.7x faster than flash at this length,
    # results/r4_longctx_tune.json) with one full-attention layer to
    # restore cross-site routing — the relational control
    # (results/local_attention_relational.json) proved pure-local
    # attention is pinned at chance on two-site relations, so any task
    # with long-range structure needs at least one global layer.
    # LEARNING claim: MEASURED POSITIVE in round 5
    # (results/r5_relational_v2.json, relational-v2 instrument): on a
    # cross-site relation where pure-local attention stays pinned at
    # chance (0.456 +/- 0.031, chance 0.5), the local/global hybrid
    # solves the task from epoch 1 in every seed (1.000, exactly
    # tracking dense).  The round-4 negative
    # (r4_hybrid_relational.json) was an instrument artifact — the v1
    # control was so hard dense itself only emerged at epoch 11.
    "longctx-16k-hybrid": dict(
        model="curvevit", curve="hilbert", img_size=128, patch_size=1,
        embed_dim=384, depth=4, n_heads=6, mlp_dim=1536,
        dtype="bfloat16", merge_layers=(1,), merge_ratio=0.5,
        attn_impl=("local", "local", "local", "auto"),
    ),
}


def preset_config(name: str, **overrides) -> ModelConfig:
    """A ModelConfig from a named preset, with field overrides."""
    if name not in PRESETS:
        raise KeyError(f"unknown preset {name!r}; available: {sorted(PRESETS)}")
    merged = {**PRESETS[name], **overrides}
    return ModelConfig(**merged)


def build_tokenizer(cfg: ModelConfig, return_levels: bool = False):
    if cfg.curve not in CURVE_REGISTRY and cfg.curve != "random":
        raise KeyError(
            f"unknown curve {cfg.curve!r}; available: "
            f"{sorted(CURVE_REGISTRY) + ['random']}"
        )
    if cfg.curve == "random" and cfg.tokenizer != "2d":
        raise ValueError(
            "curve='random' (the per-call shuffle ablation) is only "
            "implemented by the 2d tokenizer family"
        )
    dtype = cfg.jax_dtype()
    if cfg.tokenizer == "2d":
        return ConvPatchEmbedding(
            img_size=cfg.img_size, patch_size=cfg.patch_size,
            embed_dim=cfg.embed_dim, curve=cfg.curve,
            fused=cfg.fused and cfg.curve != "random", dtype=dtype,
        )
    if cfg.tokenizer == "1d":
        return PixelCurveEmbedding1D(
            img_size=cfg.img_size, patch_size=cfg.patch_size,
            embed_dim=cfg.embed_dim, curve=cfg.curve, fused=cfg.fused,
            dtype=dtype,
        )
    if cfg.tokenizer == "hierarchical":
        return HierarchicalCurveEmbedding(
            img_size=cfg.img_size, patch_size_list=tuple(cfg.patch_size_list),
            embed_dim=cfg.embed_dim, curve=cfg.curve, fused=cfg.fused,
            dtype=dtype, return_levels=return_levels,
        )
    raise KeyError(
        f"unknown tokenizer family {cfg.tokenizer!r}; "
        f"available: {TOKENIZER_FAMILIES}"
    )


def build_model(cfg: ModelConfig):
    dtype = cfg.jax_dtype()
    if cfg.model in ("simple", "curvevit"):
        # these families build their own tokenizer inline, so run the
        # same curve validation build_tokenizer would have
        if cfg.curve not in CURVE_REGISTRY:
            raise KeyError(
                f"unknown curve {cfg.curve!r} for model {cfg.model!r}; "
                f"available: {sorted(CURVE_REGISTRY)}"
                + (" ('random' is 2d-tokenizer-only)"
                   if cfg.curve == "random" else "")
            )
        if cfg.fused:
            raise ValueError(
                f"model {cfg.model!r} has no fused-tokenizer path; "
                "drop fused=True (it would be silently ignored)"
            )
    attn_impl = (cfg.attn_impl if isinstance(cfg.attn_impl, str)
                 else tuple(cfg.attn_impl))
    if not isinstance(attn_impl, str) and cfg.model not in (
            "simple", "curvevit"):
        raise ValueError(
            f"per-layer attn_impl schedules are implemented by the "
            f"family-B models ('simple'/'curvevit') only -- model "
            f"{cfg.model!r} takes a single implementation string"
        )
    if cfg.merge_layers and cfg.model != "curvevit":
        raise ValueError(
            f"merge_layers is curve-pair token merging, implemented by "
            f"model 'curvevit' only (ops/token_merge.py) -- model "
            f"{cfg.model!r} would silently ignore it"
        )
    if cfg.model in ("simple", "curvevit", "hier") and cfg.posemb != "none":
        raise ValueError(
            f"model {cfg.model!r} manages its own positional encoding "
            f"(family B: built-in sincos/GFPE; 'hier': none by design) -- "
            f"posemb={cfg.posemb!r} would be silently ignored; "
            "use model 'vit'/'vit1d' for the posemb registry"
        )
    if cfg.model == "simple":
        return SimpleViT(
            image_size=cfg.img_size, patch_size=cfg.patch_size,
            num_classes=cfg.num_classes, dim=cfg.embed_dim, depth=cfg.depth,
            heads=cfg.n_heads, mlp_dim=cfg.mlp_dim, dim_head=cfg.dim_head,
            remat=cfg.remat, dtype=dtype, attn_impl=attn_impl,
        )
    if cfg.model == "curvevit":
        return CurveViT(
            image_size=cfg.img_size, patch_size=cfg.patch_size,
            num_classes=cfg.num_classes, dim=cfg.embed_dim, depth=cfg.depth,
            heads=cfg.n_heads, mlp_dim=cfg.mlp_dim, dim_head=cfg.dim_head,
            curve=cfg.curve, remat=cfg.remat, dtype=dtype,
            attn_impl=attn_impl,
            merge_layers=tuple(cfg.merge_layers),
            merge_ratio=cfg.merge_ratio,
        )
    if cfg.model == "vit":
        return VisionTransformer(
            patch_embed=build_tokenizer(cfg), depth=cfg.depth,
            n_heads=cfg.n_heads, mlp_dim=cfg.mlp_dim,
            num_classes=cfg.num_classes, posemb=cfg.posemb,
            remat=cfg.remat, dtype=dtype, attn_impl=cfg.attn_impl,
        )
    if cfg.model == "vit1d":
        return VisionTransformer1D(
            patch_embed=build_tokenizer(cfg), depth=cfg.depth,
            n_heads=cfg.n_heads, mlp_dim=cfg.mlp_dim,
            num_classes=cfg.num_classes, posemb=cfg.posemb,
            remat=cfg.remat, dtype=dtype, attn_impl=cfg.attn_impl,
        )
    if cfg.model == "hier":
        if cfg.tokenizer != "hierarchical":
            raise ValueError("model 'hier' requires tokenizer='hierarchical'")
        return HierarchicalVisionTransformer1D(
            patch_embed=build_tokenizer(cfg, return_levels=True),
            depth=cfg.depth, n_heads=cfg.n_heads, mlp_dim=cfg.mlp_dim,
            num_classes=cfg.num_classes, remat=cfg.remat, dtype=dtype,
            attn_impl=cfg.attn_impl,
        )
    raise KeyError(
        f"unknown model family {cfg.model!r}; available: {MODEL_FAMILIES}"
    )
