"""Shared helpers for the Pallas TPU kernels (single source of truth).

Mosaic keeps per-row scalars (softmax max / sum / LSE) lane-replicated
in [rows, 128] tiles; ``lane_bcast`` adapts that layout to an arbitrary
tile width.  ``round_up`` is the usual padding helper.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["LANES", "NEG_INF", "lane_bcast", "ln_fp32", "round_up"]

LANES = 128
NEG_INF = -1e30


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def ln_fp32(v, scale, bias, eps: float = 1e-5):
    """flax ``nn.LayerNorm`` semantics over the last axis: fp32 stats
    with the clamped fast-variance form (E[x^2] - E[x]^2), scale+bias
    in fp32, rounded back to the input dtype.

    The ONE source of truth for every unfused/XLA-side LayerNorm in the
    fused-block compositions (the in-kernel copies operate on flattened
    [rows, D] refs and keep their own inline form) — an eps/variance/
    casting tweak here propagates to all of them.
    """
    import jax

    vf = v.astype(jnp.float32)
    mean = jnp.mean(vf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(vf * vf, axis=-1, keepdims=True) - mean * mean, 0.0
    )
    vn = (vf - mean) * jax.lax.rsqrt(var + eps)
    return (vn * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(v.dtype)


def lane_bcast(x, width: int):
    """Broadcast a [rows, 128] lane-replicated value to [rows, width]."""
    if width == LANES:
        return x
    if width < LANES:
        return x[:, :width]
    reps, rem = divmod(width, LANES)
    assert rem == 0, f"width {width} not a multiple of {LANES}"
    return jnp.tile(x, (1, reps))
