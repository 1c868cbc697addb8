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
