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

from .kernel_utils import LANES as _LANES, NEG_INF as _NEG_INF, \
    lane_bcast as _lane_bcast, round_up as _round_up

__all__ = ["local_block_attention", "local_block_attention_xla"]

#: Scoped-VMEM limit for the local-attention pallas_calls.  ``None`` =
#: Mosaic's 16 MiB default.  Unlike flash_attention (100 MiB default
#: since r4: big logits tiles double-buffer deeper), these kernels work
#: on window-sized (block, (2*halo+1)*block) tiles that sit far under
#: the default budget — a 100 MiB raise was A/B'd on-chip and LOST on
#: the backward (4.38 vs 4.05 ms at N=4096/block 256, +8%; forward
#: 2.29 vs 2.25, noise) (results/r4_local_vmem_ab.json): with many
#: small per-block views, the bigger budget lets Mosaic over-buffer.
#: Do not raise without re-measuring.  Module-level so experiments can
#: flip it without editing code.
_VMEM_LIMIT: Optional[int] = None


def _compiler_kwargs() -> dict:
    if _VMEM_LIMIT is None:
        return {}
    return {
        "compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        )
    }


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
            halo: int, with_lse: bool):
    nv = 2 * halo + 1
    k_refs, v_refs = refs[:nv], refs[nv : 2 * nv]
    o_ref = refs[2 * nv]
    lse_ref = refs[2 * nv + 1] if with_lse else None
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
    denom = jnp.sum(p, axis=-1, keepdims=True)
    w = (p / denom).astype(q.dtype)
    acc = jnp.zeros((q.shape[0], o_ref.shape[2]), jnp.float32)
    for s in range(nv):
        acc = acc + jax.lax.dot_general(
            w[:, s * block : (s + 1) * block], v_refs[s][0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[0] = acc.astype(o_ref.dtype)
    if with_lse:
        lse = m + jnp.log(denom)  # window-masked logsumexp, (block, 1)
        lse_ref[0] = jax.lax.broadcast_in_dim(
            lse, lse_ref.shape[1:], (0, 1)
        )


@functools.partial(
    jax.jit,
    static_argnames=("block", "halo", "scale", "return_lse", "interpret"),
)
def _local_fwd(q, k, v, block, halo, scale, return_lse=False,
               interpret=False):
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
    out_specs = [
        pl.BlockSpec((1, block, dh), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM)
    ]
    out_shapes = [jax.ShapeDtypeStruct((bh, n_pad, dh), q.dtype)]
    if return_lse:
        out_specs.append(
            pl.BlockSpec((1, block, _LANES), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shapes.append(
            jax.ShapeDtypeStruct((bh, n_pad, _LANES), jnp.float32)
        )
    res = pl.pallas_call(
        functools.partial(
            _kernel, scale=scale, n_actual=n, block=block, halo=halo,
            with_lse=return_lse,
        ),
        **_compiler_kwargs(),
        grid=(bh, n_blocks),
        in_specs=[
            pl.BlockSpec((1, block, dh), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM)
        ]
        + [kv_spec(s) for s in range(nv)]
        + [kv_spec(s) for s in range(nv)],
        out_specs=tuple(out_specs) if return_lse else out_specs[0],
        out_shape=tuple(out_shapes) if return_lse else out_shapes[0],
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * n_pad * nv * block * dh,
            bytes_accessed=3 * bh * n_pad * dh * q.dtype.itemsize,
            transcendentals=bh * n_pad * nv * block,
        ),
        interpret=interpret,
    )(qf, *([kf] * nv), *([vf] * nv))
    out, lse = (res if return_lse else (res, None))
    out = out[:, :n].reshape(b, h, n, dh).transpose(0, 2, 1, 3)
    if return_lse:
        return out, lse  # lse stays [BH, Npad, 128]
    return out


def _bwd_kernel(*refs, scale: float, n_actual: int, block: int, halo: int):
    """Windowed backward, one grid step per (bh, block) pair.

    dq for block t uses the same 2*halo+1 clamped K/V views as the
    forward.  dk/dv for block t are computed scatter-as-gather: the
    2*halo+1 clamped **q-side** views are exactly the q blocks whose
    window contains t; out-of-range views are masked to zero, so every
    output block is written exactly once (no revisited accumulation).
    Softmax is not recomputed -- the forward's window-masked LSE plus
    delta = rowsum(dO * O) reconstruct p rows exactly.
    """
    nv = 2 * halo + 1
    q_refs = refs[0:nv]
    k_refs = refs[nv : 2 * nv]
    v_refs = refs[2 * nv : 3 * nv]
    g_refs = refs[3 * nv : 4 * nv]
    lse_refs = refs[4 * nv : 5 * nv]
    dl_refs = refs[5 * nv : 6 * nv]
    dq_ref, dk_ref, dv_ref = refs[6 * nv : 6 * nv + 3]

    t = pl.program_id(1)
    nb = pl.num_programs(1)
    c = halo  # index of the centred (unclamped) view

    f32 = jnp.float32
    q_t = q_refs[c][0]
    g_t = g_refs[c][0].astype(f32)
    lse_t = lse_refs[c][0]  # (block, 128)
    dl_t = dl_refs[c][0]

    # ---- dq(t): loop over K/V window views --------------------------------
    dq = jnp.zeros((block, dq_ref.shape[2]), f32)
    for s in range(nv):
        blk = t - halo + s
        in_range = jnp.logical_and(blk >= 0, blk < nb)
        k_s = k_refs[s][0]
        v_s = v_refs[s][0]
        logits = jax.lax.dot_general(
            q_t, k_s, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        ) * scale  # (block, block)
        col = (
            jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            + blk * block
        )
        valid = jnp.logical_and(in_range, col < n_actual)
        p = jnp.where(
            valid, jnp.exp(logits - _lane_bcast(lse_t, block)), 0.0
        )
        dp = jax.lax.dot_general(
            g_t, v_s.astype(f32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )
        ds = p * (dp - _lane_bcast(dl_t, block)) * scale
        dq = dq + jax.lax.dot_general(
            ds, k_s.astype(f32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
    dq_ref[0] = dq.astype(dq_ref.dtype)

    # ---- dk(t), dv(t): loop over q-side window views ----------------------
    k_t = k_refs[c][0]
    v_t = v_refs[c][0]
    dk = jnp.zeros((block, dk_ref.shape[2]), f32)
    dv = jnp.zeros((block, dv_ref.shape[2]), f32)
    colk = jax.lax.broadcasted_iota(
        jnp.int32, (block, block), 1
    ) + t * block
    for s in range(nv):
        jq = t - halo + s
        in_range = jnp.logical_and(jq >= 0, jq < nb)
        q_j = q_refs[s][0]
        g_j = g_refs[s][0].astype(f32)
        logits = jax.lax.dot_general(
            q_j, k_t, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        ) * scale  # (block, block): rows q block jq, cols k block t
        valid = jnp.logical_and(in_range, colk < n_actual)
        p = jnp.where(
            valid,
            jnp.exp(logits - _lane_bcast(lse_refs[s][0], block)),
            0.0,
        )
        dv = dv + jax.lax.dot_general(
            p, g_j, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        dp = jax.lax.dot_general(
            g_j, v_t.astype(f32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )
        ds = p * (dp - _lane_bcast(dl_refs[s][0], block)) * scale
        dk = dk + jax.lax.dot_general(
            ds, q_j.astype(f32),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
    dk_ref[0] = dk
    dv_ref[0] = dv


@functools.partial(
    jax.jit, static_argnames=("block", "halo", "scale", "interpret")
)
def _local_bwd(q, k, v, o, g, lse, block, halo, scale, interpret=False):
    b, n, h, dh = q.shape
    bh = b * h

    def to_bhnd(x):
        return x.transpose(0, 2, 1, 3).reshape(bh, n, dh)

    qf, kf, vf, gf, of = (to_bhnd(t) for t in (q, k, v, g, o))
    n_pad = _round_up(n, block)
    if n_pad != n:
        pad = ((0, 0), (0, n_pad - n), (0, 0))
        qf, kf, vf, gf, of = (jnp.pad(t, pad) for t in (qf, kf, vf, gf, of))
    n_blocks = n_pad // block
    nv = 2 * halo + 1
    assert lse.shape == (bh, n_pad, _LANES), (lse.shape, n_pad)

    delta = jnp.sum(gf.astype(jnp.float32) * of.astype(jnp.float32), -1)
    delta = jnp.broadcast_to(delta[:, :, None], (bh, n_pad, _LANES))

    def win_index(s):
        def index_map(i, t):
            return (i, jnp.clip(t - halo + s, 0, n_blocks - 1), 0)

        return index_map

    d_spec = lambda s: pl.BlockSpec(
        (1, block, dh), win_index(s), memory_space=pltpu.VMEM
    )
    l_spec = lambda s: pl.BlockSpec(
        (1, block, _LANES), win_index(s), memory_space=pltpu.VMEM
    )
    own = lambda width: pl.BlockSpec(
        (1, block, width), lambda i, t: (i, t, 0), memory_space=pltpu.VMEM
    )
    views = lambda spec: [spec(s) for s in range(nv)]

    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_kernel, scale=scale, n_actual=n, block=block, halo=halo
        ),
        **_compiler_kwargs(),
        grid=(bh, n_blocks),
        in_specs=(
            views(d_spec) + views(d_spec) + views(d_spec)
            + views(d_spec) + views(l_spec) + views(l_spec)
        ),
        out_specs=(own(dh), own(dh), own(dh)),
        out_shape=(
            jax.ShapeDtypeStruct((bh, n_pad, dh), q.dtype),
            jax.ShapeDtypeStruct((bh, n_pad, dh), jnp.float32),
            jax.ShapeDtypeStruct((bh, n_pad, dh), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=12 * bh * n_pad * nv * block * dh,
            bytes_accessed=5 * bh * n_pad * dh * q.dtype.itemsize,
            transcendentals=2 * bh * n_pad * nv * block,
        ),
        interpret=interpret,
    )(
        *([qf] * nv), *([kf] * nv), *([vf] * nv), *([gf] * nv),
        *([lse] * nv), *([delta] * nv),
    )

    def from_bhnd(x, dtype):
        return (
            x[:, :n].reshape(b, h, n, dh).transpose(0, 2, 1, 3).astype(dtype)
        )

    return (
        from_bhnd(dq, q.dtype),
        from_bhnd(dk, k.dtype),
        from_bhnd(dv, v.dtype),
    )


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

    Differentiable: the backward is the windowed Pallas kernel
    (``_local_bwd``) -- same O(N * window) compute/memory as the
    forward, so the scaling advantage holds for training, not just
    inference.
    """
    s = q.shape[-1] ** -0.5 if scale is None else scale
    n_blocks = _round_up(q.shape[1], block) // block
    if n_blocks <= halo + 1:
        # every block is within halo of every other -> the mask is dense
        # and plain attention is exact (n_blocks <= 2*halo+1 is NOT
        # sufficient: the two end blocks would still be masked apart).
        from .flash_attention import flash_attention

        return flash_attention(q, k, v, scale=s, interpret=interpret)
    return _local_fwd(q, k, v, block, halo, s, interpret=interpret)


def _la_fwd(q, k, v, block, halo, scale, interpret):
    s = q.shape[-1] ** -0.5 if scale is None else scale
    n_blocks = _round_up(q.shape[1], block) // block
    if n_blocks <= halo + 1:
        # dense-fallback window (mask is all-ones, see primal): save
        # flash's own vjp closure so the backward reuses its residuals
        # instead of re-running a full dense forward at grad time
        from .flash_attention import flash_attention

        out, vjp = jax.vjp(
            lambda a, b, c: flash_attention(
                a, b, c, scale=s, interpret=interpret
            ),
            q, k, v,
        )
        return out, vjp
    out, lse = _local_fwd(q, k, v, block, halo, s, return_lse=True,
                          interpret=interpret)
    return out, (q, k, v, out, lse)


def _la_bwd(block, halo, scale, interpret, res, g):
    if callable(res):  # dense-fallback: flash vjp closure
        return res(g)
    q, k, v, out, lse = res
    s = q.shape[-1] ** -0.5 if scale is None else scale
    return _local_bwd(q, k, v, out, g, lse, block, halo, s,
                      interpret=interpret)


local_block_attention.defvjp(_la_fwd, _la_bwd)
