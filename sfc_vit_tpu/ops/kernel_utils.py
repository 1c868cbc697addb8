"""Shared helpers for the Pallas TPU kernels (single source of truth).

Mosaic keeps per-row scalars (softmax max / sum / LSE) lane-replicated
in [rows, 128] tiles; ``lane_bcast`` adapts that layout to an arbitrary
tile width.  ``round_up`` is the usual padding helper.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["LANES", "NEG_INF", "bwd_unroll_overhead", "lane_bcast",
           "ln_fp32", "round_up"]

LANES = 128
NEG_INF = -1e30


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def bwd_unroll_overhead(n_pad: int) -> int:
    """Scoped-VMEM live-window overhead of an unrolled per-(image, head)
    softmax-recompute loop in a fused backward kernel.

    The backward's softmax recompute is a PYTHON loop over (block_b,
    heads) — Mosaic requires static lane slicing at dh < 128, so it is
    fully unrolled — and Mosaic's scheduler keeps a pipeline window of
    ~10 extra [n_pad, n_pad] fp32 temporaries live beyond the current
    iteration.  Measured on the fused attention-block backward at
    (b=16, n=1024, d=128, heads=4, fp32): compile-time scoped-vmem OOM
    at 103.8 MiB actual vs the 64.5 MiB single-iteration model; this
    term (40.0 MiB there) lands the estimate at 104.5 MiB.  Negligible
    at ViT-B geometry (2.0 MiB at n_pad=208), so the measured-best
    block_b=8 is unaffected.

    ONE source of truth for both fused-backward choosers
    (ops/fused_attention_block.py, ops/fused_torch_attention.py): a
    re-measured coefficient must reach both, or the other chooser
    silently keeps admitting over-budget configs — the latent
    compile-OOM class described in CLAUDE.md.
    """
    return 10 * n_pad * round_up(n_pad, 128) * 4


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
