"""Fused pre-norm attention block: one Pallas kernel for
``x + W_out @ attn(LN(x) @ W_qkv)``.

The companion of :mod:`~sfc_vit_tpu.ops.fused_mlp` — together they run
a whole pre-norm encoder layer (``altvit.py:116-160`` semantics) in two
kernels.  Compared to the packed-QKV attention kernel alone
(flash_attention.py::packed_flash_attention), this also folds in the
pre-LN, the QKV projection and the output projection, so:

  * the QKV activation (3x model width) never touches HBM —
    previously the projection GEMM wrote it and the attention kernel
    read it back (2 x ~230 MB at ViT-B/256);
  * the LN-stats reduce stops being a separate XLA pass over x;
  * per layer, HBM traffic for the whole attention block drops to one
    read + one write of x (+ weights, fetched once across the grid).

Grid: over image groups (``block_b`` images per step).  Per step the
``(block_b * n_pad, D)`` row tile is LayerNormed (fp32 stats) and
multiplied by the resident W_qkv; attention then runs per image/head
on static in-register lane slices (whole-sequence fp32 softmax — the
packed-kernel design); finally the resident W_out projects back and
the residual is added.  Short-sequence only (the whole padded
sequence is one block): N <= ~1k, the regime of every reference model
(196..1024 tokens).

No biases: the pre-norm family's to_qkv/to_out are bias-free
(``altvit.py:127,138``; models/simple_vit.py::_PreNormAttention).

Backward: custom_vjp whose differentiated forward is the unfused XLA
formula — training numerics/speed are exactly the unfused path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kernel_utils import (
    NEG_INF as _NEG_INF,
    ln_fp32 as _ln_fp32,
    round_up as _round_up,
)


def _validate_packed_shapes(d_in: int, qkv_width: int, heads: int):
    """Same contract as ops.attention.packed_qkv_attention: reject
    shapes where ``// 3`` / ``// heads`` would silently truncate lane
    slices (wrong attention with no error)."""
    if qkv_width % (3 * heads) != 0:
        raise ValueError(
            f"packed QKV feature dim {qkv_width} must be divisible by "
            f"3*heads={3 * heads}"
        )

__all__ = [
    "fused_attention_block",
    "attention_block_xla",
    "attention_block_train",
    "fused_attention_block_fits",
]

_VMEM_LIMIT = 100 * 2 ** 20


def _attn_block_kernel(
    x_ref, lns_ref, lnb_ref, wqkv_ref, wout_ref, o_ref, qkv_s, att_s,
    *, heads: int, dh: int, scale: float, eps: float,
    n_pad: int, n_actual: int,
):
    bb = x_ref.shape[0]
    d = x_ref.shape[2]
    inner = heads * dh
    x = x_ref[...].reshape(bb * n_pad, d)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=1, keepdims=True) - mean * mean, 0.0
    )
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    xn = xn * lns_ref[...].astype(jnp.float32) + lnb_ref[...].astype(
        jnp.float32
    )
    xn = xn.astype(x.dtype)

    qkv_s[...] = jax.lax.dot_general(
        xn, wqkv_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)

    # loop-invariant: one iota for every (image, head) mask apply; the
    # mask itself is statically skipped when the sequence is already
    # sublane-aligned (n_actual == n_pad), e.g. the 1k-token family.
    # NOTE pad-ROW values are don't-care: only pad KEY columns are
    # masked, so rows >= n_actual compute real attention over real keys
    # plus their residual — which DIFFERS from the differentiated
    # forward (attention_block_train passes pad rows through as
    # identity).  That is fine because pad rows never contaminate real
    # rows (key masking) and are sliced off by PreNormTransformer's
    # pad-once layout; do not consume pad-row values downstream.
    masked = n_actual < n_pad
    if masked:
        col = jax.lax.broadcasted_iota(
            jnp.int32, (n_pad, n_pad), 1
        )
    for bi in range(bb):
        rows = slice(bi * n_pad, (bi + 1) * n_pad)
        blk = qkv_s[rows, :]
        for h in range(heads):
            # NOTE (measured, do not "optimize"): folding `scale` into
            # q and normalizing after the PV GEMM (divide on (n, dh)
            # instead of (n, n)) LOOKS cheaper but schedules ~8% slower
            # under Mosaic at ViT-B shapes (3.26 -> 3.50 ms A/B,
            # /tmp/ab_attn round 2) — keep scale on the logits and the
            # divide on the weights.
            q = blk[:, h * dh : (h + 1) * dh]
            k = blk[:, inner + h * dh : inner + (h + 1) * dh]
            v = blk[:, 2 * inner + h * dh : 2 * inner + (h + 1) * dh]
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            if masked:
                s = jnp.where(col < n_actual, s, _NEG_INF)
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            out = jax.lax.dot_general(
                (p / l).astype(v.dtype), v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            att_s[rows, h * dh : (h + 1) * dh] = out.astype(att_s.dtype)

    y = jax.lax.dot_general(
        att_s[...], wout_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = (y + xf).reshape(bb, n_pad, d).astype(o_ref.dtype)


def fused_attention_block_fits(
    n: int, d: int, inner: int, itemsize: int, block_b: int = 4
) -> bool:
    """VMEM gate: resident weights (double-buffer-conservative) + row
    tiles + the QKV/attention scratch + one fp32 logits tile."""
    n_pad = _round_up(n, 16)
    if n > 1024:
        return False  # whole-sequence softmax per image: short-N only
    rows = block_b * n_pad
    weights = 2 * (d * 3 * inner + inner * d) * itemsize
    tiles = 4 * rows * d * itemsize
    scratch = rows * 3 * inner * itemsize + rows * inner * itemsize
    logits = 2 * n_pad * _round_up(n_pad, 128) * 4
    ln_tmp = 2 * rows * d * 4
    return weights + tiles + scratch + logits + ln_tmp <= 0.6 * _VMEM_LIMIT


@functools.partial(
    jax.jit,
    static_argnames=(
        "heads", "scale", "eps", "block_b", "interpret", "n_actual"
    ),
)
def _fused_attn_block(
    x, ln_scale, ln_bias, w_qkv, w_out,
    heads: int, scale: float, eps: float,
    block_b: int = 4, interpret: bool = False,
    n_actual: Optional[int] = None,
):
    b, n, d = x.shape
    inner3 = w_qkv.shape[1]
    inner = inner3 // 3
    dh = inner // heads
    n_pad = _round_up(n, 16)
    real = n if n_actual is None else n_actual
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
    while b % block_b != 0:
        block_b //= 2
    rows = block_b * n_pad
    row2 = lambda a: a.reshape(1, -1)

    out = pl.pallas_call(
        functools.partial(
            _attn_block_kernel, heads=heads, dh=dh, scale=scale,
            eps=eps, n_pad=n_pad, n_actual=real,
        ),
        grid=(b // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, n_pad, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, inner3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((inner, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, n_pad, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((rows, inner3), x.dtype),
            pltpu.VMEM((rows, inner), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=(
                2 * b * n_pad * d * inner3          # qkv projection
                + 4 * b * heads * n_pad * n_pad * dh  # attention
                + 2 * b * n_pad * inner * d          # out projection
            ),
            bytes_accessed=(2 * b * n_pad * d + d * inner3 + inner * d)
            * x.dtype.itemsize,
            transcendentals=b * heads * n_pad * n_pad,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(x, row2(ln_scale), row2(ln_bias), w_qkv, w_out)
    return out[:, :n]


def attention_block_xla(
    x, ln_scale, ln_bias, w_qkv, w_out,
    heads: int, scale: Optional[float] = None, eps: float = 1e-5,
    n_actual: Optional[int] = None,
):
    """Unfused reference formula (flax semantics: LN fp32 stats, packed
    QKV layout math of ops.attention fp32 softmax); the differentiated
    forward and the CPU fallback.

    ``n_actual``: with the pad-once sequence layout (PreNormTransformer
    pads tokens to a sublane multiple ONCE for the whole stack), rows
    past ``n_actual`` are padding — the block passes them through
    unchanged (residual identity) so they never contaminate real rows.
    """
    if n_actual is not None and n_actual < x.shape[1]:
        out = attention_block_xla(
            x[:, :n_actual], ln_scale, ln_bias, w_qkv, w_out,
            heads, scale, eps,
        )
        return jnp.concatenate([out, x[:, n_actual:]], axis=1)
    b, n, d = x.shape
    _validate_packed_shapes(d, w_qkv.shape[1], heads)
    inner = w_qkv.shape[1] // 3
    dh = inner // heads
    s = dh ** -0.5 if scale is None else scale
    xn = _ln_fp32(x, ln_scale, ln_bias, eps)
    qkv = xn @ w_qkv
    x5 = qkv.reshape(b, n, 3, heads, dh)
    x5 = jnp.transpose(x5, (2, 0, 3, 1, 4))
    q, k, v = x5[0], x5[1], x5[2]
    logits = jnp.einsum(
        "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
    ).astype(jnp.float32) * s
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    att = jnp.einsum("bhnm,bhmd->bhnd", w, v)
    att = att.transpose(0, 2, 1, 3).reshape(b, n, inner)
    return x + att @ w_out


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def fused_attention_block(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w_qkv: jnp.ndarray,
    w_out: jnp.ndarray,
    heads: int,
    scale: Optional[float] = None,
    eps: float = 1e-5,
    interpret: bool = False,
    n_actual: Optional[int] = None,
) -> jnp.ndarray:
    """Whole pre-norm attention block as ONE TPU kernel ([B,N,D] in/out).

    Inference fast path (fp32 softmax, fp32 LN stats); under
    differentiation the VJP rule is the unfused composition.  Call
    sites gate on :func:`fused_attention_block_fits`.  ``n_actual``
    marks rows past it as padding (pad-once sequence layout): padded
    KEY columns are masked out of every softmax and pad rows pass
    through as residual identity in the differentiated forward.
    """
    _validate_packed_shapes(x.shape[-1], w_qkv.shape[1], heads)
    inner = w_qkv.shape[1] // 3
    dh = inner // heads
    s = dh ** -0.5 if scale is None else scale
    return _fused_attn_block(
        x, ln_scale, ln_bias, w_qkv, w_out,
        heads=heads, scale=s, eps=eps, interpret=interpret,
        n_actual=n_actual,
    )


def attention_block_train(
    x, ln_scale, ln_bias, w_qkv, w_out,
    heads: int, scale: Optional[float] = None, eps: float = 1e-5,
    n_actual: Optional[int] = None,
):
    """The unfused composition ROUTED THROUGH ``packed_qkv_attention``:
    identical to what ``_PreNormAttention`` computed before this kernel
    existed, so under differentiation the measured-fastest store-weights
    VJP (flash_attention.py::_pfa_fwd) applies unchanged — training
    numerics and speed are exactly the pre-kernel path.  Also the CPU
    fallback (packed_qkv_attention degrades to the XLA formula there).

    With ``n_actual`` (pad-once layout) the real rows are sliced out,
    computed exactly as before, and the pad rows pass through — so
    gradients and numerics for real rows are bit-identical to the
    unpadded call, and pad-row cotangents flow straight through."""
    from .attention import packed_qkv_attention

    if n_actual is not None and n_actual < x.shape[1]:
        out = attention_block_train(
            x[:, :n_actual], ln_scale, ln_bias, w_qkv, w_out,
            heads, scale, eps,
        )
        return jnp.concatenate([out, x[:, n_actual:]], axis=1)

    xn = _ln_fp32(x, ln_scale, ln_bias, eps)
    qkv = xn @ w_qkv
    att = packed_qkv_attention(qkv, heads, scale=scale)
    return x + att @ w_out


def _fab_fwd(x, ln_scale, ln_bias, w_qkv, w_out, heads, scale, eps,
             interpret, n_actual):
    out, vjp = jax.vjp(
        lambda *a: attention_block_train(
            *a, heads=heads, scale=scale, eps=eps, n_actual=n_actual
        ),
        x, ln_scale, ln_bias, w_qkv, w_out,
    )
    return out, vjp


def _fab_bwd(heads, scale, eps, interpret, n_actual, vjp, g):
    return vjp(g)


fused_attention_block.defvjp(_fab_fwd, _fab_bwd)
