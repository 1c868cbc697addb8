"""Torch <-> JAX interop helpers.

Used for (a) numerical-parity tests against the PyTorch reference and
(b) importing pretrained torch ViT checkpoints into the flax models
(``models/retrofit.py``).  Torch itself is only imported lazily so the
framework has no hard torch dependency.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

__all__ = [
    "to_numpy",
    "nchw_to_nhwc",
    "linear_params",
    "conv2d_params",
    "layernorm_params",
    "mha_params",
    "torch_encoder_layer_params",
    "torch_seq_encoder_params",
    "mixer_params",
    "predictor_params",
    "prenorm_transformer_params",
]


def to_numpy(t) -> np.ndarray:
    """torch.Tensor -> float32 numpy (detached, CPU)."""
    return t.detach().cpu().float().numpy()


def nchw_to_nhwc(x: np.ndarray) -> np.ndarray:
    """[B, C, H, W] -> [B, H, W, C] (the framework's native layout)."""
    return np.transpose(x, (0, 2, 3, 1))


def linear_params(linear) -> Dict[str, np.ndarray]:
    """torch.nn.Linear -> flax Dense params {kernel [in,out], bias [out]}."""
    out = {"kernel": to_numpy(linear.weight).T}
    if linear.bias is not None:
        out["bias"] = to_numpy(linear.bias)
    return out


def conv2d_params(conv) -> Dict[str, np.ndarray]:
    """torch.nn.Conv2d -> flax Conv params {kernel [kh,kw,C,D], bias [D]}."""
    out = {"kernel": np.transpose(to_numpy(conv.weight), (2, 3, 1, 0))}
    if conv.bias is not None:
        out["bias"] = to_numpy(conv.bias)
    return out


def layernorm_params(ln) -> Dict[str, np.ndarray]:
    """torch.nn.LayerNorm -> flax LayerNorm params {scale, bias}."""
    return {"scale": to_numpy(ln.weight), "bias": to_numpy(ln.bias)}


def mha_params(mha) -> Dict[str, Any]:
    """torch.nn.MultiheadAttention -> TorchMultiHeadAttention params."""
    return {
        "in_proj": {
            "kernel": to_numpy(mha.in_proj_weight).T,
            "bias": to_numpy(mha.in_proj_bias),
        },
        "out_proj": linear_params(mha.out_proj),
    }


def torch_encoder_layer_params(layer) -> Dict[str, Any]:
    """torch.nn.TransformerEncoderLayer -> TorchTransformerEncoderLayer."""
    return {
        "self_attn": mha_params(layer.self_attn),
        "linear1": linear_params(layer.linear1),
        "linear2": linear_params(layer.linear2),
        "norm1": layernorm_params(layer.norm1),
        "norm2": layernorm_params(layer.norm2),
    }


def torch_seq_encoder_params(encoder) -> Dict[str, Any]:
    """Reference ``TransformerSeqEncoder`` -> our ``TransformerSeqEncoder``.

    ``encoder`` is the reference module (``vit.py:177-242``) whose
    ``.transformer`` is a ``nn.TransformerEncoder``.
    """
    return {
        f"layer_{i}": torch_encoder_layer_params(layer)
        for i, layer in enumerate(encoder.transformer.layers)
    }


def mixer_params(mixer) -> Dict[str, Any]:
    """Reference ``MixerBlock`` (``vit.py:250-273``) -> our MixerBlock.

    Only the active channel-mix branch carries forward-relevant params.
    """
    return {
        "channel_mix_ln": layernorm_params(mixer.channel_mix_ln),
        "channel_mix_0": linear_params(mixer.channel_mix[0]),
        "channel_mix_1": linear_params(mixer.channel_mix[2]),
    }


def predictor_params(head) -> Dict[str, Any]:
    """Reference ``MultiLayerPredictor`` (``vit.py:295-319``, mix=False,
    n_layers=2) -> our MultiLayerPredictor."""
    modules = list(head)
    out: Dict[str, Any] = {"norm": layernorm_params(modules[0])}
    fact = modules[1]
    out["fact"] = {"W_emb": to_numpy(fact.W_emb), "W_seq": to_numpy(fact.W_seq)}
    out["out"] = linear_params(modules[-1])
    return out


def prenorm_transformer_params(transformer) -> Dict[str, Any]:
    """Reference altvit ``Transformer`` (``altvit.py:145-160``) -> our
    PreNormTransformer."""
    out: Dict[str, Any] = {"norm": layernorm_params(transformer.norm)}
    for i, (attn, ff) in enumerate(transformer.layers):
        out[f"attn_{i}"] = {
            "norm": layernorm_params(attn.norm),
            "to_qkv": linear_params(attn.to_qkv),
            "to_out": linear_params(attn.to_out),
        }
        out[f"ff_{i}"] = {
            "norm": layernorm_params(ff.net[0]),
            "fc1": linear_params(ff.net[1]),
            "fc2": linear_params(ff.net[3]),
        }
    return out
