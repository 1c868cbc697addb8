"""Pallas TPU flash attention: streaming online-softmax kernel.

Design (TPU-first): the forward tiles queries AND keys over the grid —
``grid = (batch*heads, n_q_blocks, n_k_blocks)`` with the K axis
innermost — folding one ``(block_q, block_k)`` logits tile at a time
into an online-softmax accumulator held in VMEM scratch.  VMEM residency
is O(block_q * block_k), independent of sequence length, so sequences
≫16k tokens run with the same kernel.  For short sequences the auto
policy picks ``block_k = n_pad`` (a single K step per Q tile), which
degenerates to the round-1 full-KV-resident design with identical data
movement (K/V are fetched once; Pallas's pipeliner keeps the block
resident while only the inner grid index advances).

fp32 logits/softmax on the MXU/VPU, no HBM round-trip for the attention
matrix.  The forward optionally emits the log-sum-exp per row (stored
lane-replicated, ``[BH, N, 128]`` — the Mosaic-friendly layout used by
the upstream JAX TPU kernel) for the streaming backward.

Backward:
  * ``n_pad <= _FUSED_BWD_MAX``: single fused kernel that recomputes the
    softmax per Q tile and accumulates dK/dV into revisited output
    blocks (measured 12% faster than XLA at N=1024, RESULTS.md).
  * larger N: two streaming kernels — dQ over ``(bh, nq, nk)`` and
    dK/dV over ``(bh, nk, nq)`` — both O(block) VMEM, reusing the saved
    LSE plus ``delta = rowsum(dO * O)`` computed in XLA.

Layout: [B, N, H, Dh] in/out (matches ``ops.attention``); rectangular
(cross-attention) shapes are supported — K/V may have a different
sequence length than Q (used by the Ulysses-style
``parallel.sequence_parallel_attention`` for its Q-slice x
gathered-K/V step).  Parity with
the reference semantics (``torch.nn.functional.scaled_dot_product_
attention`` at /root/reference/src/vit.py) is pinned by
tests/test_ops.py; fp32-softmax numerics match
:func:`~sfc_vit_tpu.ops.attention.dot_product_attention_xla`.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import dot_product_attention_xla
from .kernel_utils import LANES as _LANES, NEG_INF as _NEG_INF, \
    lane_bcast as _lane_bcast, round_up as _round_up

__all__ = [
    "flash_attention", "packed_flash_attention",
    "flash_attention_with_lse",
]
# Above this padded length use the streaming backward pair instead of
# the one-pass fused backward.  History: at Mosaic's 16 MiB default
# scoped-VMEM limit the boundary was 2048 (block_q=512 at N=4096 needs
# 25.8 MiB of logits-sized fp32 temporaries + full dK/dV blocks); with
# the 100 MiB `_VMEM_LIMIT` below the fused kernel compiles AND wins at
# both 4k and 8k (results/r4_flash_vmem_limit_ab.json: 6.77/6.89 ms at
# N=4096 dh32/dh64 vs 7.69/7.49 streaming; 6.92 vs 7.32 at N=8192) —
# it recomputes the logits once where the streaming pair recomputes
# them twice.  Past 8k the (block_q, n_pad) fp32 temporaries exceed
# even the raised budget (16 MiB per tile at bq=512/N=16k).
_FUSED_BWD_MAX = 8192
# Streaming forward: single K step (full-KV data movement) up to here.
# Re-confirmed at the 100 MiB limit (results/r4_flash_fwd_retune_100m
# .json): past 4k the bk=1024 streaming forward beats bk=2048/4096 and
# the single-K-step at both 8k (9.79 vs 10.0-10.4 ms) and 16k (5.54 vs
# 5.88-5.91) — bigger K chunks don't pay even with VMEM headroom.
_SINGLE_KSTEP_MAX = 4096
#: Scoped-VMEM limit for the flash pallas_calls.  Mosaic's default is
#: 16 MiB; v5e has 128 MiB physical VMEM and the fused-block kernels
#: (fused_mlp.py etc.) already run at 100 MiB per-call on the same
#: chip.  Raised here on the strength of measurement
#: (results/r4_flash_vmem_limit_ab.json): the raise alone is -8.3% on
#: the measured-good bf16 N=4096 forward (deeper double-buffering) and
#: unlocks the one-pass fused backward to N=8192.  ``None`` restores
#: the 16 MiB default — the regime the `_fwd_block_q_cap` demotion
#: budget was tuned in; that cap is KEPT even at 100 MiB because the
#: demoted fp32 config measured as fast as the undemoted one (4.077 vs
#: 4.136 ms — a config that overflows 16 MiB has logits temporaries
#: too big to double-buffer well).
_VMEM_LIMIT: Optional[int] = 100 * 2 ** 20


#: Separate scoped-VMEM limit for the STREAMING backward pair (the
#: >8k regime).  The 100 MiB raise that wins on the forward and fused
#: backward was A/B'd here and measured a TIE at both 16k and 32k
#: (results/r4_stream_bwd_vmem_ab.json: 16.47/31.17 ms at 16 MiB vs
#: 16.78/31.47 at 100 MiB — the ~2% edge for the default is inside the
#: 3% noise floor): the pair's small fixed (512, 1024) tiles already
#: double-buffer fully at 16 MiB.  ``None`` = Mosaic's 16 MiB default.
_VMEM_LIMIT_STREAM_BWD: Optional[int] = None


def _compiler_kwargs(limit: Optional[int] = -1) -> dict:
    lim = _VMEM_LIMIT if limit == -1 else limit
    if lim is None:
        return {}
    return {
        "compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=lim
        )
    }


# ---------------------------------------------------------------------------
# Forward: streaming online softmax
# ---------------------------------------------------------------------------


def _fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, *rest,
    scale: float, n_actual: int, block_k: int, with_lse: bool,
    _single_k_step: bool = False,
):
    """One (block_h, block_q, block_k) step of the online softmax.

    ``block_h`` (the leading block dim) folds several (batch, head)
    slices into one grid step: at short sequence lengths (ViT-B/16's
    196 tokens) a single head's tile is far too small to cover the
    per-step DMA + dispatch cost, so we batch the heads of an image and
    unroll 2D MXU matmuls over them.
    """
    if with_lse:
        lse_ref, m_s, l_s, acc_s = rest
    else:
        lse_ref, (m_s, l_s, acc_s) = None, rest
    kk = pl.program_id(2)
    nk = pl.num_programs(2)

    if _single_k_step:
        # Static fast path: the whole K/V fits one block, so plain
        # softmax — no scratch round-trips, no correction terms.
        g = q_ref.shape[0]
        for s_i in range(g):
            q = q_ref[s_i]
            k = k_ref[s_i]
            v = v_ref[s_i]
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < n_actual, s, _NEG_INF)
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            out = jax.lax.dot_general(
                (p / l).astype(v.dtype), v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[s_i] = out.astype(o_ref.dtype)
            if with_lse:
                lse_ref[s_i] = jax.lax.broadcast_in_dim(
                    m + jnp.log(l), lse_ref.shape[1:], (0, 1)
                )
        return

    @pl.when(kk == 0)
    def _init():
        m_s[...] = jnp.full(m_s.shape, -jnp.inf, jnp.float32)
        l_s[...] = jnp.zeros(l_s.shape, jnp.float32)
        acc_s[...] = jnp.zeros(acc_s.shape, jnp.float32)

    g = q_ref.shape[0]
    dh = acc_s.shape[-1]
    for s_i in range(g):  # unrolled: g is a static block dim
        q = q_ref[s_i]  # (BQ, Dh)
        k = k_ref[s_i]  # (BK, Dh)
        v = v_ref[s_i]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (BQ, BK)
        col = (
            jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kk * block_k
        )
        s = jnp.where(col < n_actual, s, _NEG_INF)

        m_prev = m_s[s_i]  # (BQ, 128)
        l_prev = l_s[s_i]
        m_curr = jnp.max(s, axis=1)[:, None]  # (BQ, 1)
        m_next = jnp.maximum(m_prev, m_curr)  # (BQ, 128)
        p = jnp.exp(s - _lane_bcast(m_next, s.shape[1]))  # (BQ, BK)
        alpha = jnp.exp(m_prev - m_next)  # (BQ, 128)
        l_next = jnp.sum(p, axis=1)[:, None] + alpha * l_prev
        m_s[s_i] = m_next
        l_s[s_i] = l_next

        acc_s[s_i] = acc_s[s_i] * _lane_bcast(alpha, dh) + (
            jax.lax.dot_general(
                p.astype(v.dtype), v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )

    @pl.when(kk == nk - 1)
    def _store():
        for s_i in range(g):
            l_fin = l_s[s_i]
            inv = jnp.where(l_fin == 0.0, 1.0, 1.0 / l_fin)
            o_ref[s_i] = (
                acc_s[s_i] * _lane_bcast(inv, dh)
            ).astype(o_ref.dtype)
            if with_lse:
                lse_ref[s_i] = m_s[s_i] + jnp.log(
                    jnp.where(l_fin == 0.0, 1.0, l_fin)
                )


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_q", "block_k", "block_h",
                     "return_lse", "interpret"),
)
def _flash_fwd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    block_q: int = 128,
    block_k: Optional[int] = None,
    block_h: Optional[int] = None,
    return_lse: bool = False,
    interpret: bool = False,
):
    b, nq, h, dh = q.shape
    nk = k.shape[1]  # cross-attention: K/V may differ from Q in length
    bh = b * h

    def to_bhnd(x):
        return x.transpose(0, 2, 1, 3).reshape(bh, x.shape[1], dh)

    qf, kf, vf = to_bhnd(q), to_bhnd(k), to_bhnd(v)
    bk = _auto_block_k(nk) if block_k is None else block_k
    block_q = _fwd_block_q_cap(block_q, bk, q.dtype)
    n_pad_q = _round_up(nq, block_q)
    g = _auto_block_h(max(nq, nk), h) if block_h is None else block_h
    assert bh % g == 0, f"block_h {g} must divide batch*heads {bh}"
    n_pad_k = _round_up(nk, bk)
    if n_pad_q != nq:
        qf = jnp.pad(qf, ((0, 0), (0, n_pad_q - nq), (0, 0)))
    if n_pad_k != nk:
        pad = ((0, 0), (0, n_pad_k - nk), (0, 0))
        kf = jnp.pad(kf, pad)
        vf = jnp.pad(vf, pad)

    grid = (bh // g, n_pad_q // block_q, n_pad_k // bk)
    out_shapes = [jax.ShapeDtypeStruct((bh, n_pad_q, dh), q.dtype)]
    out_specs = [
        pl.BlockSpec((g, block_q, dh), lambda i, j, kk: (i, j, 0),
                     memory_space=pltpu.VMEM)
    ]
    if return_lse:
        out_shapes.append(
            jax.ShapeDtypeStruct((bh, n_pad_q, _LANES), jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec((g, block_q, _LANES), lambda i, j, kk: (i, j, 0),
                         memory_space=pltpu.VMEM)
        )
    res = pl.pallas_call(
        functools.partial(
            _fwd_kernel, scale=scale, n_actual=nk, block_k=bk,
            with_lse=return_lse,
            _single_k_step=(n_pad_k // bk == 1),
        ),
        **_compiler_kwargs(),
        grid=grid,
        in_specs=[
            pl.BlockSpec((g, block_q, dh), lambda i, j, kk: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, bk, dh), lambda i, j, kk: (i, kk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, bk, dh), lambda i, j, kk: (i, kk, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs) if return_lse else out_specs[0],
        out_shape=tuple(out_shapes) if return_lse else out_shapes[0],
        scratch_shapes=[
            pltpu.VMEM((g, block_q, _LANES), jnp.float32),
            pltpu.VMEM((g, block_q, _LANES), jnp.float32),
            pltpu.VMEM((g, block_q, dh), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * n_pad_q * n_pad_k * dh,
            bytes_accessed=(
                bh * n_pad_q * dh * q.dtype.itemsize
                + (n_pad_q // block_q) * bh * 2 * n_pad_k * dh
                * q.dtype.itemsize
                + bh * n_pad_q * dh * q.dtype.itemsize
            ),
            transcendentals=bh * n_pad_q * n_pad_k,
        ),
        interpret=interpret,
    )(qf, kf, vf)
    out, lse = (res if return_lse else (res, None))

    def from_bhnd(x):
        return x[:, :nq].reshape(b, h, nq, dh).transpose(0, 2, 1, 3)

    if return_lse:
        return from_bhnd(out), lse  # lse stays [BH, Npad_q, 128]
    return from_bhnd(out)


# ---------------------------------------------------------------------------
# Backward A: fused full-KV kernel (short sequences; measured fastest)
# ---------------------------------------------------------------------------


def _fused_bwd_kernel(
    q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
    *, scale: float, n_actual: int,
):
    """Fused backward: recompute softmax per q-tile, accumulate dk/dv
    across q-tiles (their output block is revisited every grid step, the
    standard Pallas reduction pattern)."""
    j = pl.program_id(1)
    q = q_ref[0]  # (BQ, Dh)
    k = k_ref[0]  # (Np, Dh)
    v = v_ref[0]
    g = g_ref[0].astype(jnp.float32)  # (BQ, Dh)

    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    n_pad = k.shape[0]
    if n_pad != n_actual:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < n_actual, logits, _NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)  # (BQ, Np) fp32

    # dv += p^T g ; dp = g v^T ; ds = p * (dp - rowsum(dp*p)) * scale
    dv_c = jax.lax.dot_general(
        p, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Np, Dh)
    dp = jax.lax.dot_general(
        g, v.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, Np)
    delta = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - delta) * scale  # (BQ, Np)
    dq = jax.lax.dot_general(
        ds, k.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dk_c = jax.lax.dot_general(
        ds, q.astype(jnp.float32),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Np, Dh)

    dq_ref[0] = dq.astype(dq_ref.dtype)

    @pl.when(j == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    dk_ref[0] += dk_c
    dv_ref[0] += dv_c


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "interpret")
)
def _fused_bwd(q, k, v, g, scale, block_q=128, interpret=False):
    b, nq, h, dh = q.shape
    nk = k.shape[1]  # cross-attention supported
    bh = b * h

    def to_bhnd(x):
        return x.transpose(0, 2, 1, 3).reshape(bh, x.shape[1], dh)

    qf, kf, vf, gf = (to_bhnd(t) for t in (q, k, v, g))
    n_pad_q = _round_up(nq, block_q)
    n_pad_k = _round_up(nk, 128)
    if n_pad_q != nq:
        pad = ((0, 0), (0, n_pad_q - nq), (0, 0))
        qf, gf = (jnp.pad(t, pad) for t in (qf, gf))
    if n_pad_k != nk:
        pad = ((0, 0), (0, n_pad_k - nk), (0, 0))
        kf, vf = (jnp.pad(t, pad) for t in (kf, vf))

    grid = (bh, n_pad_q // block_q)
    tile = lambda: pl.BlockSpec(
        (1, block_q, dh), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )
    full = lambda: pl.BlockSpec(
        (1, n_pad_k, dh), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
    )
    dq, dk, dv = pl.pallas_call(
        functools.partial(_fused_bwd_kernel, scale=scale, n_actual=nk),
        **_compiler_kwargs(),
        grid=grid,
        in_specs=[tile(), full(), full(), tile()],
        out_specs=(tile(), full(), full()),
        out_shape=(
            jax.ShapeDtypeStruct((bh, n_pad_q, dh), q.dtype),
            jax.ShapeDtypeStruct((bh, n_pad_k, dh), jnp.float32),
            jax.ShapeDtypeStruct((bh, n_pad_k, dh), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * n_pad_q * n_pad_k * dh,
            bytes_accessed=8 * bh * n_pad_q * dh * q.dtype.itemsize,
            transcendentals=bh * n_pad_q * n_pad_k,
        ),
        interpret=interpret,
    )(qf, kf, vf, gf)

    def from_bhnd(x, n, dtype):
        return (
            x[:, :n].reshape(b, h, n, dh).transpose(0, 2, 1, 3).astype(dtype)
        )

    return (
        from_bhnd(dq, nq, q.dtype),
        from_bhnd(dk, nk, k.dtype),
        from_bhnd(dv, nk, v.dtype),
    )


# ---------------------------------------------------------------------------
# Backward B: streaming kernels (long sequences; O(block) VMEM)
# ---------------------------------------------------------------------------


def _dq_kernel(
    q_ref, k_ref, v_ref, g_ref, lse_ref, dl_ref, dq_ref, dq_s,
    *, scale: float, n_actual: int, block_k: int,
):
    kk = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kk == 0)
    def _init():
        dq_s[...] = jnp.zeros(dq_s.shape, jnp.float32)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0].astype(jnp.float32)
    lse = lse_ref[0]  # (BQ, 128)
    dl = dl_ref[0]  # (BQ, 128) = rowsum(dO * O)

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (BQ, BK)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kk * block_k
    s = jnp.where(col < n_actual, s, _NEG_INF)
    p = jnp.exp(s - _lane_bcast(lse, s.shape[1]))
    dp = jax.lax.dot_general(
        g, v.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, BK)
    ds = p * (dp - _lane_bcast(dl, s.shape[1])) * scale
    dq_s[...] += jax.lax.dot_general(
        ds, k.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kk == nk - 1)
    def _store():
        dq_ref[0] = dq_s[...].astype(dq_ref.dtype)


def _dkv_kernel(
    k_ref, v_ref, q_ref, g_ref, lse_ref, dl_ref, dk_ref, dv_ref,
    dk_s, dv_s,
    *, scale: float, n_actual: int, block_k: int,
):
    j = pl.program_id(2)  # q-block index (innermost)
    nq = pl.num_programs(2)
    kk = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        dk_s[...] = jnp.zeros(dk_s.shape, jnp.float32)
        dv_s[...] = jnp.zeros(dv_s.shape, jnp.float32)

    k = k_ref[0]  # (BK, Dh)
    v = v_ref[0]
    q = q_ref[0]  # (BQ, Dh)
    g = g_ref[0].astype(jnp.float32)
    lse = lse_ref[0]
    dl = dl_ref[0]

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (BQ, BK)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kk * block_k
    s = jnp.where(col < n_actual, s, _NEG_INF)
    p = jnp.exp(s - _lane_bcast(lse, s.shape[1]))  # (BQ, BK)
    # Padded q rows contribute nothing: their g and dl rows are zero.
    dv_s[...] += jax.lax.dot_general(
        p, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BK, Dh)
    dp = jax.lax.dot_general(
        g, v.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, BK)
    ds = p * (dp - _lane_bcast(dl, s.shape[1])) * scale
    dk_s[...] += jax.lax.dot_general(
        ds, q.astype(jnp.float32),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BK, Dh)

    @pl.when(j == nq - 1)
    def _store():
        dk_ref[0] = dk_s[...]
        dv_ref[0] = dv_s[...]


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_q", "block_k", "interpret"),
)
def _streaming_bwd(q, k, v, o, g, lse, scale, block_q=256, block_k=1024,
                   interpret=False):
    """Streaming backward: dQ pass over (bh, nq, nk), dK/dV pass over
    (bh, nk, nq).  Uses the forward's LSE; delta = rowsum(dO*O) is a
    cheap XLA elementwise+reduce."""
    b, nq, h, dh = q.shape
    nk = k.shape[1]  # cross-attention supported
    bh = b * h

    def to_bhnd(x):
        return x.transpose(0, 2, 1, 3).reshape(bh, x.shape[1], dh)

    qf, kf, vf, gf, of = (to_bhnd(t) for t in (q, k, v, g, o))
    n_pad_q = _round_up(nq, block_q)
    n_pad_k = _round_up(nk, block_k)
    if n_pad_q != nq:
        pad = ((0, 0), (0, n_pad_q - nq), (0, 0))
        qf, gf, of = (jnp.pad(t, pad) for t in (qf, gf, of))
    if n_pad_k != nk:
        pad = ((0, 0), (0, n_pad_k - nk), (0, 0))
        kf, vf = (jnp.pad(t, pad) for t in (kf, vf))

    # delta[i, r] = sum_d dO[i,r,d] * O[i,r,d], lane-replicated to 128.
    delta = jnp.sum(
        gf.astype(jnp.float32) * of.astype(jnp.float32), axis=-1
    )  # (BH, Npad_q)
    delta = jnp.broadcast_to(delta[:, :, None], (bh, n_pad_q, _LANES))
    assert lse.shape == (bh, n_pad_q, _LANES), (lse.shape, n_pad_q)

    q_tile = lambda ix: pl.BlockSpec((1, block_q, dh), ix,
                                     memory_space=pltpu.VMEM)
    k_tile = lambda ix: pl.BlockSpec((1, block_k, dh), ix,
                                     memory_space=pltpu.VMEM)
    lane_tile = lambda ix: pl.BlockSpec((1, block_q, _LANES), ix,
                                        memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, n_actual=nk,
                          block_k=block_k),
        **_compiler_kwargs(_VMEM_LIMIT_STREAM_BWD),
        grid=(bh, n_pad_q // block_q, n_pad_k // block_k),
        in_specs=[
            q_tile(lambda i, j, kk: (i, j, 0)),
            k_tile(lambda i, j, kk: (i, kk, 0)),
            k_tile(lambda i, j, kk: (i, kk, 0)),
            q_tile(lambda i, j, kk: (i, j, 0)),
            lane_tile(lambda i, j, kk: (i, j, 0)),
            lane_tile(lambda i, j, kk: (i, j, 0)),
        ],
        out_specs=q_tile(lambda i, j, kk: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad_q, dh), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, dh), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=6 * bh * n_pad_q * n_pad_k * dh,
            bytes_accessed=4 * bh * n_pad_q * dh * q.dtype.itemsize,
            transcendentals=bh * n_pad_q * n_pad_k,
        ),
        interpret=interpret,
    )(qf, kf, vf, gf, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, n_actual=nk,
                          block_k=block_k),
        **_compiler_kwargs(_VMEM_LIMIT_STREAM_BWD),
        grid=(bh, n_pad_k // block_k, n_pad_q // block_q),
        in_specs=[
            k_tile(lambda i, kk, j: (i, kk, 0)),
            k_tile(lambda i, kk, j: (i, kk, 0)),
            q_tile(lambda i, kk, j: (i, j, 0)),
            q_tile(lambda i, kk, j: (i, j, 0)),
            lane_tile(lambda i, kk, j: (i, j, 0)),
            lane_tile(lambda i, kk, j: (i, j, 0)),
        ],
        out_specs=(
            k_tile(lambda i, kk, j: (i, kk, 0)),
            k_tile(lambda i, kk, j: (i, kk, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, n_pad_k, dh), jnp.float32),
            jax.ShapeDtypeStruct((bh, n_pad_k, dh), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, dh), jnp.float32),
            pltpu.VMEM((block_k, dh), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * bh * n_pad_q * n_pad_k * dh,
            bytes_accessed=4 * bh * n_pad_q * dh * q.dtype.itemsize,
            transcendentals=bh * n_pad_q * n_pad_k,
        ),
        interpret=interpret,
    )(kf, vf, qf, gf, lse, delta)

    def from_bhnd(x, n, dtype):
        return (
            x[:, :n].reshape(b, h, n, dh).transpose(0, 2, 1, 3).astype(dtype)
        )

    return (
        from_bhnd(dq, nq, q.dtype),
        from_bhnd(dk, nk, k.dtype),
        from_bhnd(dv, nk, v.dtype),
    )


# ---------------------------------------------------------------------------
# Public API: custom-VJP flash_attention
# ---------------------------------------------------------------------------


def _auto_block_q(n: int) -> int:
    """Measured on v5e: bq=512 wins at every length past 512 under the
    100 MiB `_VMEM_LIMIT` (results/r4_flash_fwd_retune_100m.json —
    N=1024: 1.71 vs 1.83 ms for 512 vs the old 128; N=2048: 2.11 vs
    2.24; N=4096: 4.47 vs 4.72 from the round-2 sweep; bq=1024 probes
    lost at 4k and only tied whole-N at 1k).  The old ``128 below
    2048`` band was a 16 MiB-era optimum.  Non-power-of-two lengths
    take the largest tile that divides the 128-padded length so the
    bigger tile never buys extra padded rows (the 512-vs-128 win is
    ~6%; 17% extra padding would swamp it).  Short sequences use one
    q block padded to the 16-sublane bf16 tile (196 -> 208, vs XLA's
    256 MXU padding)."""
    if n <= 512:
        return _round_up(n, 16)
    n_pad = _round_up(n, 128)
    for bq in (512, 256, 128):
        if n_pad % bq == 0:
            return bq
    return 128


def _auto_block_h(n: int, h: int) -> int:
    """Heads folded per grid step: at short N a single head's tile is
    too small to cover DMA/dispatch per step, so batch whole images'
    heads (largest divisor of h keeping ~<=4k q rows per step)."""
    if n > 512:
        return 1
    n_pad = _round_up(n, 16)
    best = 1
    for g in range(1, h + 1):
        if h % g == 0 and g * n_pad <= 4096:
            best = g
    return best


def _auto_block_k(n: int) -> int:
    """Single K step (old full-KV data movement) while the logits tile
    fits VMEM comfortably; stream in 1k chunks beyond."""
    n_pad = _round_up(n, 128)
    return n_pad if n_pad <= _SINGLE_KSTEP_MAX else 1024


#: Live-pair budget for `_fwd_block_q_cap` (bytes).  15 MiB is the
#: measured compile boundary at Mosaic's 16 MiB default scoped-VMEM
#: limit (see the docstring below).  With `_VMEM_LIMIT` raised to
#: 100 MiB the cap is no longer a compile necessity but stays as the
#: measured perf optimum: the over-budget fp32 config was A/B'd a tie
#: with its demoted sibling (4.136 vs 4.077 ms,
#: results/r4_flash_vmem_limit_ab.json), and larger-than-cap tiles
#: were probed and lost (scripts/r4_flash_fwd_retune_100m.py).
#: Module-level so experiments can probe past it without editing code.
_FWD_PAIR_BUDGET = 15 * 2 ** 20


def _fwd_block_q_cap(block_q: int, block_k: int, dtype) -> int:
    """Demote the forward q tile while its modeled VMEM live window
    exceeds the 16 MB scoped budget.

    Mosaic keeps TWO (block_q, block_k) temporaries live in the fwd
    body — the fp32 logits tile ``s`` and ``exp(s - m)``; the ``/l``
    and ``astype(v.dtype)`` steps reuse dead buffers.  For fp32 inputs
    the live pair is 8*bq*bk bytes: measured 16.91 MiB scoped
    allocation at (bq=512, bk=4096, fp32) — 928 KiB over the 16 MiB
    limit, a compile-time OOM that killed the relational
    local-attention study's pallas arm at 4,096 tokens / dh=32
    (results/local_attention_relational.json).  For bf16 inputs the
    second live tile is the bf16 ``p`` fed to the MXU (6*bq*bk total,
    12.6 MiB at the same blocks — the measured-good config behind the
    attention-scaling table in RESULTS.md, which must NOT demote).
    The 15 MiB budget leaves room for the q/k/v/o tiles and the lane
    scratch; the boundary is MEASURED, not modeled
    (results/r4_flash_fwd_vmem_probe.json, executed per-config on
    chip): a 15.0 MiB pair (bq=512, bk=3840, fp32) compiles at dh 32
    and 64, a 15.5 MiB pair (bk=3968) overflows scoped VMEM by
    416 KiB — so an earlier 15.5 MiB budget was exactly one block_k
    boundary too generous.  In practice only fp32 single-K-step
    configs with N in (3840, 4096] demote (512 -> 256); the
    round_up(n, bq) padding is identical for both tiles across that
    whole range, so the saved LSE row count seen by the streaming
    backward is unchanged.
    """
    per_elem = 4 + min(jnp.dtype(dtype).itemsize, 4)
    bq = block_q
    while bq > 128 and per_elem * bq * block_k > _FWD_PAIR_BUDGET:
        bq //= 2
    return bq


def _use_streaming_bwd(n: int) -> bool:
    return _round_up(n, 128) > _FUSED_BWD_MAX


def _fused_bwd_block_q(nq: int, nk: int) -> int:
    """q-tile for the one-pass fused backward, measured on v5e at the
    100 MiB `_VMEM_LIMIT` (results/r4_flash_vmem_limit_ab.json and the
    band sweep in results/r4_fused_bwd_band_ab.json): bq=512 wins at
    n_pad >= 4096 (6.77-6.92 ms vs 7.3-7.7 streaming; bq=256 is the
    worst of the three — Mosaic's scheduling, not op count).  The
    <=2048 band keeps the round-1 bq=128 optimum: at N=2048 bq=512
    measured a statistical whisker ahead (3.242 vs 3.392 ms) but at
    N=1024 it is a 7x CLIFF (16.1 vs 2.2 ms), so the band stays on the
    safe tile; <=512 runs one padded tile.  Do not extend past 8192:
    at 16k fused bq=256 is a 2x loss (25.7 vs 13.0 streaming) and
    bq=512's logits temporaries overflow even the raised limit
    (compile failure)."""
    n = max(nq, nk)
    if n <= 512:
        return _round_up(nq, 16)
    if _round_up(n, 128) <= 2048:
        return min(128, _round_up(nq, 16))
    # don't pad a short cross-attention q side up to the long-N tile
    return min(512, _round_up(nq, 16))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    block_h: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Streaming fused TPU attention on [B, N, H, Dh]; numerically
    matches :func:`~sfc_vit_tpu.ops.attention.dot_product_attention_xla`
    (fp32 online softmax) at any sequence length."""
    s = q.shape[-1] ** -0.5 if scale is None else scale
    bq = _auto_block_q(q.shape[1]) if block_q is None else block_q
    return _flash_fwd(q, k, v, s, block_q=bq, block_k=block_k,
                      block_h=block_h, interpret=interpret)


def _fa_fwd(q, k, v, scale, block_q, block_k, block_h, interpret):
    s = q.shape[-1] ** -0.5 if scale is None else scale
    bq = _auto_block_q(q.shape[1]) if block_q is None else block_q
    if _use_streaming_bwd(max(q.shape[1], k.shape[1])):
        out, lse = _flash_fwd(q, k, v, s, block_q=bq, block_k=block_k,
                              block_h=block_h, return_lse=True,
                              interpret=interpret)
        # save only ONE lane of the 128x lane-replicated LSE: the full
        # [BH, Npad, 128] layout pinned ~128x the logical bytes in HBM
        # per layer from forward to backward (805 MB/layer at b32 h12
        # N4096); the bwd re-broadcasts a transient copy.
        return out, (q, k, v, out, lse[:, :, :1])
    out = _flash_fwd(q, k, v, s, block_q=bq, block_k=block_k,
                     block_h=block_h, interpret=interpret)
    return out, (q, k, v, None, None)


def _fa_bwd(scale, block_q, block_k, block_h, interpret, res, g):
    q, k, v, out, lse = res
    s = q.shape[-1] ** -0.5 if scale is None else scale
    if lse is not None:
        # The LSE rows arrive padded to the FWD q-block multiple.  The
        # bwd kernels have a tighter VMEM envelope than the fwd (four
        # (block_q, block_k) fp32 temporaries), so cap both blocks at
        # the measured-good (512, 1024) and re-pad/slice the LSE rows
        # to the bwd's own q padding — any divisor works, pad rows are
        # don't-care (zero-padded g zeroes their dk/dv contributions).
        # MIRROR the fwd's VMEM demotion (`_fwd_block_q_cap`, keyed on
        # the K/V length) before deriving the padding: the saved LSE
        # covers round_up(nq, capped) rows, and with cross-attention
        # shapes (nq != nk, e.g. the Ulysses Q-slice x gathered-K/V
        # step) the capped and uncapped paddings genuinely diverge —
        # slicing by the uncapped padding would over-run the saved
        # rows and fail at trace time (tests/test_ops.py::
        # test_saved_lse_padding_covers_streaming_bwd).
        bq_fwd = _auto_block_q(q.shape[1]) if block_q is None else block_q
        bk_fwd = _auto_block_k(k.shape[1]) if block_k is None else block_k
        bq_fwd = _fwd_block_q_cap(bq_fwd, bk_fwd, q.dtype)
        # cap only when 512 divides the fwd block: then the bwd padding
        # is <= the fwd padding the saved LSE rows cover
        bq = 512 if bq_fwd > 512 and bq_fwd % 512 == 0 else bq_fwd
        # bk=2048 measured fastest for the pair at 16k AND 32k (12.38
        # vs 12.82, 22.43 vs 23.42 ms — results/r4_stream_bwd_blocks
        # .json; bq 256/128 are 14-67% losses) but only take it when
        # it adds no K padding over the 1024 tile (the ~4% win would
        # be swamped by up-to-11% padded K rows at awkward lengths).
        nk_pad = _round_up(k.shape[1], 1024)
        bk_auto = 2048 if nk_pad % 2048 == 0 else 1024
        bk = min(block_k or bk_auto, bk_auto)
        n_pad_bwd = _round_up(q.shape[1], bq)
        lse = jnp.broadcast_to(
            lse[:, :n_pad_bwd], (lse.shape[0], n_pad_bwd, _LANES)
        )
        return _streaming_bwd(q, k, v, out, g, lse, s,
                              block_q=bq, block_k=bk,
                              interpret=interpret)
    auto_bq = _fused_bwd_block_q(q.shape[1], k.shape[1])
    if block_q is not None:
        # An explicit fwd-legal block_q can exceed the fused backward's
        # VMEM envelope (~5-10 live (block_q, n_pad) fp32 temporaries),
        # so cap at the measured-good size for this length band.
        bq = min(block_q, auto_bq)
    else:
        bq = auto_bq
    return _fused_bwd(q, k, v, g, s, block_q=bq, interpret=interpret)


flash_attention.defvjp(_fa_fwd, _fa_bwd)


def flash_attention_with_lse(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    interpret: bool = False,
    chunk: int = 512,
):
    """Attention output PLUS the per-query log-sum-exp: the kernel-stats
    observability path (round 3, VERDICT item 7).

    Returns ``(out [B,N,H,Dh], lse [B,H,Nq])``.  With q, k and the LSE,
    any subset of attention-weight rows reconstructs in O(|rows| * N)
    (:func:`sfc_vit_tpu.utils.profiling.attention_rows`) — no [N, N]
    weights tensor is ever materialized, so the capture can observe the
    production flash kernel at 4k+ tokens where the XLA recompute
    (``attention_with_weights``) would blow HBM.

    On TPU (or under ``interpret``) the LSE comes from the flash
    forward kernel itself; elsewhere a chunked XLA logsumexp streams
    q-blocks of ``chunk`` rows (O(N^2) compute, O(chunk*N) memory).
    """
    b, nq, h, dh = q.shape
    s = dh ** -0.5 if scale is None else scale
    if jax.default_backend() == "tpu" or interpret:
        bq = _auto_block_q(nq)
        out, lse = _flash_fwd(q, k, v, s, block_q=bq, return_lse=True,
                              interpret=interpret)
        lse = lse[:, :nq, 0].reshape(b, h, nq)
        return out, lse
    out = dot_product_attention_xla(q, k, v, scale=s)
    qb = q.transpose(0, 2, 1, 3).astype(jnp.float32)  # [B,H,N,dh]
    kb = k.transpose(0, 2, 1, 3).astype(jnp.float32)
    n_pad = _round_up(nq, chunk)
    if n_pad != nq:
        qb = jnp.pad(qb, ((0, 0), (0, 0), (0, n_pad - nq), (0, 0)))
    qc = qb.reshape(b, h, n_pad // chunk, chunk, dh)
    qc = jnp.moveaxis(qc, 2, 0)  # [C, B, H, chunk, dh]

    def one(qx):
        sc = jnp.einsum(
            "bhcd,bhnd->bhcn", qx, kb,
            preferred_element_type=jnp.float32,
        ) * s
        return jax.scipy.special.logsumexp(sc, axis=-1)

    lse = jax.lax.map(one, qc)  # [C, B, H, chunk]
    lse = jnp.moveaxis(lse, 0, 2).reshape(b, h, n_pad)[:, :, :nq]
    return out, lse


# ---------------------------------------------------------------------------
# Packed-QKV short-sequence kernel: consumes the QKV GEMM output as-is
# ---------------------------------------------------------------------------


def _packed_kernel(qkv_ref, o_ref, *, heads: int, dh: int, scale: float,
                   n_actual: int):
    """Whole-sequence attention on ``block_b`` images' packed QKV blocks.

    Each block is the projection GEMM's output row-tile
    ``(block_b, BQ, 3*H*Dh)`` — no layout change between the GEMM and
    the kernel, so the BNHD head transposes AND the [N, N] logits HBM
    round-trips both vanish.  Heads are static lane slices, resolved
    in-register by Mosaic; folding several images per grid step
    amortizes the per-step scalar/dispatch work of the 3*H slices.
    Requires the full (padded) sequence in one q block: short-N only.
    """
    inner = heads * dh
    for bi in range(qkv_ref.shape[0]):
        x = qkv_ref[bi]  # (BQ, 3*H*Dh)
        for h in range(heads):
            q = x[:, h * dh : (h + 1) * dh]
            k = x[:, inner + h * dh : inner + (h + 1) * dh]
            v = x[:, 2 * inner + h * dh : 2 * inner + (h + 1) * dh]
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # (BQ, BQ)
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < n_actual, s, _NEG_INF)
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            out = jax.lax.dot_general(
                (p / l).astype(v.dtype), v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[bi, :, h * dh : (h + 1) * dh] = out.astype(o_ref.dtype)


#: packed kernel applies when the whole padded sequence fits one q block
#: (VMEM-bound: at 2048 the fp32 logits tile alone is the 16 MB scoped
#: budget).  Measured at 1024 tokens: 4.03 ms vs 7.15 for split+flash.
_PACKED_MAX_N = 1024


def packed_attention_fits(n: int, three_inner: int, itemsize: int) -> bool:
    """VMEM gate for :func:`packed_flash_attention`: the whole-sequence
    block + two live fp32 [N, N] tiles must fit the 16 MB scoped VMEM.
    Calibrated against compiled-good shapes (ViT-B/196 bf16 ~1.4 MB;
    h8/dh64/1024 bf16 ~11.5 MB) with headroom below the observed limit;
    wider-x-longer combinations fall back to the split flash path
    instead of failing Mosaic compilation."""
    if n > _PACKED_MAX_N:
        return False
    n_pad = _round_up(n, 16)
    n_lanes = _round_up(n_pad, _LANES)
    budget = n_pad * three_inner * itemsize + 2 * n_pad * n_lanes * 4
    return budget <= 12 * 2 ** 20


@functools.partial(
    jax.jit, static_argnames=("heads", "scale", "block_b", "interpret")
)
def _packed_fwd(qkv, heads, scale, block_b=None, interpret=False):
    b, n, three_inner = qkv.shape
    inner = three_inner // 3
    dh = inner // heads
    n_pad = _round_up(n, 16)
    if n_pad != n:
        qkv = jnp.pad(qkv, ((0, 0), (0, n_pad - n), (0, 0)))
    if block_b is None:
        # measured (v5e, ViT-B shapes): 1 > 2 > 4 > 8 — bigger image
        # folds reduce the DMA/compute pipelining overlap.
        block_b = 1
    assert b % block_b == 0, f"block_b {block_b} must divide batch {b}"
    out = pl.pallas_call(
        functools.partial(_packed_kernel, heads=heads, dh=dh,
                          scale=scale, n_actual=n),
        grid=(b // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, n_pad, three_inner),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((block_b, n_pad, inner),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, inner), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * n_pad * n_pad * dh,
            bytes_accessed=b * n_pad * (three_inner + inner)
            * qkv.dtype.itemsize,
            transcendentals=b * heads * n_pad * n_pad,
        ),
        interpret=interpret,
    )(qkv)
    return out[:, :n]


def _packed_xla_ref(qkv, heads, scale):
    """Reference math for the packed kernel's VJP (and CPU fallback)."""
    b, n, three_inner = qkv.shape
    inner = three_inner // 3
    dh = inner // heads
    x5 = qkv.reshape(b, n, 3, heads, dh)
    x5 = jnp.transpose(x5, (2, 0, 3, 1, 4))
    q, k, v = x5[0], x5[1], x5[2]
    logits = jnp.einsum(
        "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
    ).astype(jnp.float32) * scale
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhnm,bhmd->bhnd", w, v)
    return out.transpose(0, 2, 1, 3).reshape(b, n, inner)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def packed_flash_attention(
    qkv: jnp.ndarray,
    heads: int,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Short-sequence attention straight off the packed QKV projection.

    [B, N, 3*H*Dh] -> [B, N, H*Dh] with fp32 softmax, zero layout
    changes at the GEMM boundary.  Only valid for N <= ``_PACKED_MAX_N``
    (the whole padded sequence is one VMEM block).  Backward falls back
    to the XLA formula (flash-style recompute) — the training path's
    cost is unchanged; this kernel is the inference fast path.
    """
    s = (qkv.shape[-1] // 3 // heads) ** -0.5 if scale is None else scale
    if not interpret and jax.default_backend() != "tpu":
        # honor the documented CPU fallback (pallas_call has no CPU
        # lowering outside interpret mode)
        return _packed_xla_ref(qkv, heads, s)
    return _packed_fwd(qkv, heads, s, interpret=interpret)


def _pfa_fwd(qkv, heads, scale, interpret):
    """Differentiated forward: the XLA input-dtype-softmax formula with
    the attention weights STORED as a residual.

    custom_vjp runs this rule only when gradients flow, so training
    keeps the measured-fastest configuration (store-p autodiff, 954
    train img/s at ViT-B) while non-differentiated calls — inference —
    take the Pallas packed kernel (2,712 img/s headline).  Measured
    losers: jax.vjp(_packed_xla_ref) recompute paid a full extra
    forward (811 train img/s); an fp32-everywhere manual backward
    materialized four fp32 [N,N] tensors (690); input-dtype recompute
    without stored p reached only 892.  The input-dtype softmax under
    training matches the round-1/2 behavior and the bf16-vs-fp32
    equivalence study (results/bf16_softmax_study.json)."""
    b, n, three_inner = qkv.shape
    inner = three_inner // 3
    dh = inner // heads
    s = dh ** -0.5 if scale is None else scale
    x5 = qkv.reshape(b, n, 3, heads, dh)
    x5 = jnp.transpose(x5, (2, 0, 3, 1, 4))  # (3, B, H, N, Dh)
    q, k, v = x5[0], x5[1], x5[2]
    sc = jnp.asarray(s, q.dtype)
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k) * sc
    p = jax.nn.softmax(logits, axis=-1)  # input dtype
    out = jnp.einsum("bhnm,bhmd->bhnd", p, v)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
    return out, (q, k, v, p)


def _pfa_bwd(heads, scale, interpret, res, g):
    q, k, v, p = res
    b, h, n, dh = q.shape
    s = dh ** -0.5 if scale is None else scale
    sc = jnp.asarray(s, q.dtype)
    gh = g.reshape(b, n, h, dh).transpose(0, 2, 1, 3)  # (B,H,N,Dh)
    dp = jnp.einsum("bhnd,bhmd->bhnm", gh, v)
    delta = jnp.sum(p * dp, axis=-1, keepdims=True)
    ds = p * (dp - delta) * sc
    dq = jnp.einsum("bhnm,bhmd->bhnd", ds, k)
    dk = jnp.einsum("bhnm,bhnd->bhmd", ds, q)
    dv = jnp.einsum("bhnm,bhnd->bhmd", p, gh)
    dx5 = jnp.stack([dq, dk, dv], axis=0)  # (3, B, H, N, Dh)
    dqkv = jnp.transpose(dx5, (1, 3, 0, 2, 4)).reshape(
        b, n, 3 * h * dh
    )
    return (dqkv,)


packed_flash_attention.defvjp(_pfa_fwd, _pfa_bwd)
