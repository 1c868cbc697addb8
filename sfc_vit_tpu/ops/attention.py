"""Attention dispatch: Pallas flash-attention kernel with XLA fallback.

All models route attention through :func:`multi_head_attention` so the
TPU kernel is a drop-in.  Layout is [B, N, H, Dh] throughout (the
TPU-friendly "BNHD" layout; no transposes at the call site).

Implementations:
  * ``"xla"``      -- explicit scaled-dot-product softmax attention;
                      exact torch semantics (fp32 softmax), used on CPU
                      and for parity tests.
  * ``"xla_bf16"`` -- softmax in the input dtype (no fp32 round-trip).
  * ``"pallas"``   -- streaming flash attention kernel
                      (``ops/flash_attention.py``); TPU only.
  * ``"local"``    -- curve-local block attention, O(N*window).
  * ``"ring"``/``"sp"`` -- sequence-parallel attention over the ambient
                      ``parallel.sequence_sharding`` mesh axis (ppermute
                      ring / all-gather-KV); degrade to xla off-mesh.
  * ``"auto"``     -- TPU, packed entry point: the packed-QKV Pallas
                      kernel while the whole sequence fits VMEM
                      (fp32 softmax, N <= ~1k; measured 1.98x XLA
                      end-to-end at 1k tokens), streaming flash past
                      1k tokens.  TPU, BNHD entry point: flash at
                      >=1k, bf16 softmax for short bf16 rows
                      (accuracy-study-gated,
                      results/bf16_softmax_study.json).  CPU: xla.

``packed_qkv_attention`` is the preferred model-side entry point: it
takes the packed QKV projection as-is — the kernel consumes the
projection GEMM's output block with zero layout changes, and even the
XLA fallback avoids the split/head-reshape relayouts (17% of ViT-B fwd
device time, scripts/profile_forward.py).

One level above this dispatch, the pre-norm model family folds the
WHOLE attention block (LN + QKV proj + attention + out proj +
residual) into one kernel under ``auto`` on TPU
(``ops/fused_attention_block.py``, with the stack's token axis padded
once — models/simple_vit.py::PreNormTransformer) and family A folds
everything after the attention into ``ops/fused_mlp.py::
fused_postnorm_tail``; this module remains the training path (the
fused kernels' custom-VJP forwards route back through
``packed_qkv_attention``) and the path for every explicit
``implementation=`` override.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = [
    "multi_head_attention",
    "packed_qkv_attention",
    "dot_product_attention_xla",
    "attention_with_weights",
]


def attention_with_weights(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
):
    """Attention that also returns per-head weights [B, H, N, N].

    The observability path (the reference's fully-commented
    ``CustomTransformerEncoderLayer`` at ``vit.py:48-174`` wanted exactly
    this); used when a model is applied with a mutable 'intermediates'
    collection.  Always the XLA formula -- the flash kernel never
    materializes weights.
    """
    dh = q.shape[-1]
    scale = dh ** -0.5 if scale is None else scale
    logits = jnp.einsum(
        "bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32
    )  # preferred_element_type alone establishes the fp32 invariant
    weights = jax.nn.softmax(logits * scale, axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", weights.astype(q.dtype), v)
    return out, weights


def dot_product_attention_xla(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Reference attention: softmax(q k^T * scale) v, [B, N, H, Dh].

    Softmax is computed in fp32 regardless of input dtype (the torch /
    flash-attention convention), then cast back.
    """
    dh = q.shape[-1]
    scale = dh ** -0.5 if scale is None else scale
    logits = jnp.einsum(
        "bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32
    ) * scale
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", weights, v)


def dot_product_attention_bf16(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Fast path: softmax in the input dtype (no fp32 round-trip).

    Profiling at ViT-B shapes showed the fp32 softmax converts/reductions
    are ~50% of per-layer device time (TODO.md); this variant is ~13%
    faster on attention at the cost of bf16 softmax precision.  Opt-in
    (``implementation='xla_bf16'``) -- it diverges from the fp32 torch
    parity the default keeps.
    """
    dh = q.shape[-1]
    scale = dh ** -0.5 if scale is None else scale
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k) * jnp.asarray(
        scale, q.dtype
    )
    weights = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhnm,bmhd->bnhd", weights, v)


#: Sequence-length crossover for the auto dispatch (measured on v5e,
#: RESULTS.md): below it XLA's fused attention wins, at/above it the
#: streaming flash kernel wins.
_PALLAS_MIN_N = 1024
_PALLAS_HEAD_DIMS = (64, 128, 256)

_IMPLEMENTATIONS = (
    "auto", "xla", "xla_bf16", "pallas", "local", "ring", "sp",
)


def _pallas_ok(n: int, dh: int) -> bool:
    """The single auto-dispatch gate for the flash kernel (shared by
    :func:`multi_head_attention` and :func:`packed_qkv_attention` so the
    measured crossover lives in one place)."""
    if jax.default_backend() != "tpu":
        return False
    return dh in _PALLAS_HEAD_DIMS and n >= _PALLAS_MIN_N


def _pallas_available(q: jnp.ndarray) -> bool:
    b, n, h, dh = q.shape
    return _pallas_ok(n, dh)


def _bf16_softmax_ok(q: jnp.ndarray, n: int) -> bool:
    """auto picks the bf16-softmax path for short bf16 sequences on TPU.

    Gated on the round-2 accuracy study (scripts/bf16_softmax_study.py,
    results/bf16_softmax_study.json): per-epoch accuracy curves of the
    flagship VisionTransformer1D and CurveViT are identical between
    fp32- and bf16-softmax training (3 seeds x 10 epochs, bf16
    activations), while the fp32 round-trip costs ~16% of attention
    time at ViT-B shapes (3.00 -> 2.53 ms, RESULTS.md round 2).
    Short sequences only (the study's regime; at >= _PALLAS_MIN_N the
    flash kernel takes over, and when its head-dim gate fails we keep
    fp32 softmax rather than extrapolate the study to long rows).
    Explicit ``implementation='xla'`` still forces fp32 softmax.

    ``n`` is the SEQUENCE length, passed explicitly because callers
    hold different layouts (BNHD vs the packed path's BHND — inferring
    from ``q.shape[1]`` silently tested the head count there, enabling
    bf16 softmax for exactly the long rows the study excluded).
    """
    return (
        jax.default_backend() == "tpu"
        and q.dtype == jnp.bfloat16
        and n < _PALLAS_MIN_N
    )


def packed_qkv_attention(
    qkv: jnp.ndarray,
    heads: int,
    scale: Optional[float] = None,
    implementation: str = "auto",
) -> jnp.ndarray:
    """Attention on a packed [B, N, 3*H*Dh] QKV projection -> [B, N, H*Dh].

    Profiling the ViT-B/16 forward (scripts/profile_forward.py, round 2)
    showed the conventional ``split + per-tensor head reshape`` between
    the QKV GEMM and the attention einsums materializes ~4 relayout
    passes over the activations — 17% of total device time.  This entry
    point replaces them with ONE 5-D transpose into the batch-leading
    [3, B, H, N, Dh] layout the attention einsums want (so XLA inserts
    no further operand transposes), and folds the head-merge back into
    the output reshape.

    Falls back to the BNHD :func:`multi_head_attention` dispatcher for
    kernel-backed implementations (pallas/local/ring/sp), which manage
    their own layouts.
    """
    if implementation not in _IMPLEMENTATIONS:
        raise ValueError(
            f"unknown attention implementation {implementation!r}; "
            f"one of {_IMPLEMENTATIONS}"
        )
    b, n, three_inner = qkv.shape
    if three_inner % (3 * heads) != 0:
        raise ValueError(
            f"packed QKV feature dim {three_inner} must be divisible by "
            f"3*heads={3 * heads}"
        )
    inner = three_inner // 3
    dh = inner // heads
    if implementation == "auto" and jax.default_backend() == "tpu":
        # deferred per-branch import (module convention): pure-XLA
        # callers never pay the Pallas/Mosaic import
        from .flash_attention import (
            packed_attention_fits,
            packed_flash_attention,
        )

        if packed_attention_fits(n, three_inner, qkv.dtype.itemsize):
            # Short-sequence fast path: whole-sequence attention
            # straight off the packed projection (fp32 softmax, zero
            # layout changes, no [N,N] HBM traffic) — measured 3.84 vs
            # 4.74 ms for the XLA path at ViT-B shapes and 4.03 vs 7.15
            # for split+flash at 1024 tokens (RESULTS.md round 2).
            # Under differentiation its VJP rule uses the store-weights
            # XLA formula, so training keeps the measured-fastest
            # configuration.
            return packed_flash_attention(qkv, heads, scale)
    kernel_backed = implementation in ("pallas", "local", "ring", "sp") or (
        implementation == "auto" and _pallas_ok(n, dh)
    )
    if kernel_backed:
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, n, heads, dh)
        k = k.reshape(b, n, heads, dh)
        v = v.reshape(b, n, heads, dh)
        out = multi_head_attention(q, k, v, scale, implementation)
        return out.reshape(b, n, inner)

    x5 = qkv.reshape(b, n, 3, heads, dh)
    x5 = jnp.transpose(x5, (2, 0, 3, 1, 4))  # (3, B, H, N, Dh): 1 relayout
    q, k, v = x5[0], x5[1], x5[2]
    s = dh ** -0.5 if scale is None else scale
    if implementation == "xla_bf16" or (
        implementation == "auto" and _bf16_softmax_ok(q, n)
    ):
        logits = jnp.einsum("bhnd,bhmd->bhnm", q, k) * jnp.asarray(
            s, q.dtype
        )
        weights = jax.nn.softmax(logits, axis=-1)
    else:
        # preferred_element_type alone establishes the fp32 invariant
        logits = jnp.einsum(
            "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
        ) * s
        weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhnm,bhmd->bhnd", weights, v)
    return out.transpose(0, 2, 1, 3).reshape(b, n, inner)


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    implementation: str = "auto",
) -> jnp.ndarray:
    """Multi-head attention on [B, N, H, Dh] tensors.

    Args:
        implementation: one of ``_IMPLEMENTATIONS`` — "auto" (backend/
          shape-routed), "xla", "xla_bf16" (bf16 softmax), "pallas"
          (flash kernel), "local" (curve-local windowed), "ring"/"sp"
          (sequence-parallel; need the ambient ``sequence_sharding``
          context, else degrade to the local XLA path).
    """
    if implementation == "xla":
        return dot_product_attention_xla(q, k, v, scale)
    if implementation == "xla_bf16":
        return dot_product_attention_bf16(q, k, v, scale)
    if implementation == "local":
        # curve-local block attention (O(N*window); see local_attention.py)
        from .local_attention import (
            local_block_attention,
            local_block_attention_xla,
        )

        if jax.default_backend() == "tpu":
            return local_block_attention(q, k, v, scale=scale)
        return local_block_attention_xla(q, k, v, scale=scale)
    if implementation in ("ring", "sp"):
        # Sequence parallelism: token axis sharded over the ambient
        # mesh axis (parallel/context.py).  Degrades to the local XLA
        # path when no mesh is active, the axis is trivial, or N does
        # not divide it -- so 'ring' models still run single-chip.
        from ..parallel.context import active_sequence_sharding

        ctx = active_sequence_sharding()
        if ctx is not None:
            mesh, axis = ctx
            p = mesh.shape[axis]
            if p > 1 and q.shape[1] % p == 0:
                from ..parallel.sequence import (
                    ring_attention,
                    sequence_parallel_attention,
                )

                if implementation == "ring":
                    return ring_attention(mesh, q, k, v, axis=axis,
                                          scale=scale)
                return sequence_parallel_attention(mesh, q, k, v,
                                                   axis=axis, scale=scale)
        return dot_product_attention_xla(q, k, v, scale)
    if implementation == "pallas" or (
        implementation == "auto" and _pallas_available(q)
    ):
        from .flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale)
    if implementation not in _IMPLEMENTATIONS:
        raise ValueError(
            f"unknown attention implementation {implementation!r}; "
            f"one of {_IMPLEMENTATIONS}"
        )
    if implementation == "auto" and _bf16_softmax_ok(q, q.shape[1]):
        return dot_product_attention_bf16(q, k, v, scale)
    return dot_product_attention_xla(q, k, v, scale)
