"""Curve-local block attention (Pallas) -- the scaling path for long
curve-ordered sequences.

Space-filling-curve ordering is itself a locality-preserving layout:
tokens that are close on the curve are close in the image (the whole
premise of the reference, quantified by its clustering-number metric).
That gives *block-local* attention natural semantics -- each query tile
attends to its own curve block and ``halo`` neighbouring blocks on each
side -- turning O(N^2) attention into O(N * W) with almost no semantic
loss for curve-ordered tokens.  (Same direction as the retrieved
Hilbert-attention literature, PAPERS.md: HilbertA, Hilbert-guided sparse
local attention.)

TPU mapping: the window is expressed as ``2*halo + 1`` per-block K/V
views (each its own BlockSpec, so Pallas pipelines them in logical-block
units); the kernel masks clamped-duplicate edge views, giving **exactly**
the ``|block(q) - block(k)| <= halo`` semantics of the dense-mask
reference at every position.  fp32 softmax over the (BQ, window) tile,
everything VMEM-resident, no [N, N] materialization ever.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["local_block_attention", "local_block_attention_xla"]

_NEG_INF = -1e30


def local_block_attention_xla(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block: int = 128,
    halo: int = 1,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Dense-mask reference: softmax over |block(q) - block(k)| <= halo."""
    dh = q.shape[-1]
    scale = dh ** -0.5 if scale is None else scale
    n = q.shape[1]
    ids = jnp.arange(n) // block
    mask = jnp.abs(ids[:, None] - ids[None, :]) <= halo
    logits = jnp.einsum(
        "bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32
    ).astype(jnp.float32) * scale
    logits = jnp.where(mask[None, None], logits, _NEG_INF)
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", weights, v)


def _kernel(q_ref, *refs, scale: float, n_actual: int, block: int,
            halo: int):
    nv = 2 * halo + 1
    k_refs, v_refs = refs[:nv], refs[nv : 2 * nv]
    o_ref = refs[2 * nv]
    j = pl.program_id(1)
    n_blocks = pl.num_programs(1)
    q = q_ref[0]  # (block, Dh)

    segs = []
    for s in range(nv):
        logits = jax.lax.dot_general(
            q, k_refs[s][0],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        seg_block = j - halo + s  # the block this view *should* cover
        in_range = jnp.logical_and(seg_block >= 0, seg_block < n_blocks)
        col = (
            jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            + seg_block * block
        )
        valid = jnp.logical_and(in_range, col < n_actual)
        segs.append(jnp.where(valid, logits, _NEG_INF))
    logits = jnp.concatenate(segs, axis=1)  # (block, nv*block)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    w = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(q.dtype)
    acc = jnp.zeros((q.shape[0], o_ref.shape[2]), jnp.float32)
    for s in range(nv):
        acc = acc + jax.lax.dot_general(
            w[:, s * block : (s + 1) * block], v_refs[s][0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[0] = acc.astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(
    jax.jit, static_argnames=("block", "halo", "scale", "interpret")
)
def _local_fwd(q, k, v, block, halo, scale, interpret):
    b, n, h, dh = q.shape
    bh = b * h

    def to_bhnd(x):
        return x.transpose(0, 2, 1, 3).reshape(bh, n, dh)

    qf, kf, vf = to_bhnd(q), to_bhnd(k), to_bhnd(v)
    n_pad = _round_up(n, block)
    if n_pad != n:
        pad = ((0, 0), (0, n_pad - n), (0, 0))
        qf, kf, vf = (jnp.pad(t, pad) for t in (qf, kf, vf))
    n_blocks = n_pad // block
    nv = 2 * halo + 1

    def kv_index(s):
        def index_map(i, j):
            return (i, jnp.clip(j - halo + s, 0, n_blocks - 1), 0)

        return index_map

    kv_spec = lambda s: pl.BlockSpec(
        (1, block, dh), kv_index(s), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, scale=scale, n_actual=n, block=block, halo=halo
        ),
        grid=(bh, n_blocks),
        in_specs=[
            pl.BlockSpec((1, block, dh), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM)
        ]
        + [kv_spec(s) for s in range(nv)]
        + [kv_spec(s) for s in range(nv)],
        out_specs=pl.BlockSpec((1, block, dh), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * n_pad * nv * block * dh,
            bytes_accessed=3 * bh * n_pad * dh * q.dtype.itemsize,
            transcendentals=bh * n_pad * nv * block,
        ),
        interpret=interpret,
    )(qf, *([kf] * nv), *([vf] * nv))
    return out[:, :n].reshape(b, h, n, dh).transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def local_block_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block: int = 128,
    halo: int = 1,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Curve-local attention on [B, N, H, Dh]: exact
    ``|block(q) - block(k)| <= halo`` masking, O(N * (2*halo+1) * block).

    Differentiable: backward runs the dense-mask XLA formula (a fused
    windowed backward kernel is a later optimization).
    """
    s = q.shape[-1] ** -0.5 if scale is None else scale
    n_blocks = _round_up(q.shape[1], block) // block
    if n_blocks <= halo + 1:
        # every block is within halo of every other -> the mask is dense
        # and plain attention is exact (n_blocks <= 2*halo+1 is NOT
        # sufficient: the two end blocks would still be masked apart).
        from .flash_attention import flash_attention

        return flash_attention(q, k, v, scale=s, interpret=interpret)
    return _local_fwd(q, k, v, block, halo, s, interpret)


def _la_fwd(q, k, v, block, halo, scale, interpret):
    return local_block_attention(q, k, v, block, halo, scale, interpret), (
        q, k, v,
    )


def _la_bwd(block, halo, scale, interpret, res, g):
    q, k, v = res
    s = q.shape[-1] ** -0.5 if scale is None else scale
    _, vjp = jax.vjp(
        lambda a, b, c: local_block_attention_xla(a, b, c, block, halo, s),
        q, k, v,
    )
    return vjp(g)


local_block_attention.defvjp(_la_fwd, _la_bwd)
