"""Model zoo: both reference families plus the pretrained retrofit.

Family A (``src/models/vit.py``): post-norm torch-style encoders with
factorized heads.  Family B (``src/models/altvit.py``): pre-norm
SimpleViT/CurveViT with sincos/GFPE positional encodings.
"""

from .layers import (
    FactorisedLinear,
    MixerBlock,
    MultiLayerPredictor,
    TokenAggregator,
    TorchMultiHeadAttention,
    TorchTransformerEncoderLayer,
    TransformerSeqEncoder,
)
from .posemb import build_posemb, gfpe, sincos_1d
from .retrofit import RetrofitViT, load_torchvision_vit, resize_pos_embedding
from .simple_vit import (
    CurvePatchEmbedding,
    CurveViT,
    HilbertViT,
    PreNormTransformer,
    SimpleViT,
)
from .vit import (
    HierarchicalVisionTransformer1D,
    VisionTransformer,
    VisionTransformer1D,
)

__all__ = [
    "FactorisedLinear",
    "MixerBlock",
    "MultiLayerPredictor",
    "TokenAggregator",
    "TorchMultiHeadAttention",
    "TorchTransformerEncoderLayer",
    "TransformerSeqEncoder",
    "build_posemb",
    "RetrofitViT",
    "load_torchvision_vit",
    "resize_pos_embedding",
    "gfpe",
    "sincos_1d",
    "CurvePatchEmbedding",
    "CurveViT",
    "HilbertViT",
    "PreNormTransformer",
    "SimpleViT",
    "HierarchicalVisionTransformer1D",
    "VisionTransformer",
    "VisionTransformer1D",
]
