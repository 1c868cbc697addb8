"""Pallas TPU attention kernel.

Design (TPU-first, sized to this framework's workloads): ViT sequence
lengths here are 64..4096 tokens, so K/V for one (batch, head) fit in
VMEM comfortably.  The kernel therefore tiles **queries** over the grid
and keeps the full K/V block VMEM-resident -- one HBM read per operand,
fp32 logits/softmax on the MXU/VPU, no HBM round-trip for the attention
matrix (the thing XLA's unfused path would materialize).  An online-
softmax variant for >16k tokens can slot in behind the same signature.

Backward: custom VJP recomputes attention grads via the XLA reference
formula (flash-style recompute; a fused Pallas backward is a later
optimization).

Layout: [B, N, H, Dh] in/out (matches ``ops.attention``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import dot_product_attention_xla

__all__ = ["flash_attention"]

_NEG_INF = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_actual: int):
    q = q_ref[0]  # (BQ, Dh)
    k = k_ref[0]  # (Np, Dh)
    v = v_ref[0]  # (Np, Dh)
    logits = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    logits = logits * scale
    n_pad = k.shape[0]
    if n_pad != n_actual:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < n_actual, logits, _NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    w = (p / denom).astype(v.dtype)
    out = jax.lax.dot_general(
        w,
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = out.astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "interpret"))
def _flash_fwd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    block_q: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    b, n, h, dh = q.shape
    bh = b * h

    def to_bhnd(x):
        return x.transpose(0, 2, 1, 3).reshape(bh, n, dh)

    qf, kf, vf = to_bhnd(q), to_bhnd(k), to_bhnd(v)
    n_pad = _round_up(n, block_q)
    if n_pad != n:
        pad = ((0, 0), (0, n_pad - n), (0, 0))
        qf = jnp.pad(qf, pad)
        kf = jnp.pad(kf, pad)
        vf = jnp.pad(vf, pad)

    grid = (bh, n_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, n_actual=n),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_q, dh), lambda i, j: (i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, n_pad, dh), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, n_pad, dh), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, dh), lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * n_pad * n_pad * dh,
            bytes_accessed=3 * bh * n_pad * dh * q.dtype.itemsize
            + bh * n_pad * dh * q.dtype.itemsize,
            transcendentals=bh * n_pad * n_pad,
        ),
        interpret=interpret,
    )(qf, kf, vf)
    out = out[:, :n]
    return out.reshape(b, h, n, dh).transpose(0, 2, 1, 3)


def _attn_bwd_kernel(
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
def _flash_bwd(q, k, v, g, scale, block_q=128, interpret=False):
    b, n, h, dh = q.shape
    bh = b * h

    def to_bhnd(x):
        return x.transpose(0, 2, 1, 3).reshape(bh, n, dh)

    qf, kf, vf, gf = (to_bhnd(t) for t in (q, k, v, g))
    n_pad = _round_up(n, block_q)
    if n_pad != n:
        pad = ((0, 0), (0, n_pad - n), (0, 0))
        qf, kf, vf, gf = (jnp.pad(t, pad) for t in (qf, kf, vf, gf))

    grid = (bh, n_pad // block_q)
    tile = lambda: pl.BlockSpec(
        (1, block_q, dh), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )
    full = lambda: pl.BlockSpec(
        (1, n_pad, dh), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
    )
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale, n_actual=n),
        grid=grid,
        in_specs=[tile(), full(), full(), tile()],
        out_specs=(tile(), full(), full()),
        out_shape=(
            jax.ShapeDtypeStruct((bh, n_pad, dh), q.dtype),
            jax.ShapeDtypeStruct((bh, n_pad, dh), jnp.float32),
            jax.ShapeDtypeStruct((bh, n_pad, dh), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * n_pad * n_pad * dh,
            bytes_accessed=8 * bh * n_pad * dh * q.dtype.itemsize,
            transcendentals=bh * n_pad * n_pad,
        ),
        interpret=interpret,
    )(qf, kf, vf, gf)

    def from_bhnd(x, dtype):
        return (
            x[:, :n].reshape(b, h, n, dh).transpose(0, 2, 1, 3).astype(dtype)
        )

    return (
        from_bhnd(dq, q.dtype),
        from_bhnd(dk, k.dtype),
        from_bhnd(dv, v.dtype),
    )


def _auto_block_q(n: int) -> int:
    """Measured on v5e (RESULTS.md): larger q-tiles win at long
    sequences (4.47 vs 4.72 ms at N=4096 for 512 vs 128)."""
    return 512 if n >= 2048 else 128


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    block_q: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused TPU attention on [B, N, H, Dh]; numerically matches
    :func:`~sfc_vit_tpu.ops.attention.dot_product_attention_xla`."""
    s = q.shape[-1] ** -0.5 if scale is None else scale
    bq = _auto_block_q(q.shape[1]) if block_q is None else block_q
    return _flash_fwd(q, k, v, s, block_q=bq, interpret=interpret)


def _fa_fwd(q, k, v, scale, block_q, interpret):
    return flash_attention(q, k, v, scale, block_q, interpret), (q, k, v)


def _fa_bwd(scale, block_q, interpret, res, g):
    q, k, v = res
    s = q.shape[-1] ** -0.5 if scale is None else scale
    bq = _auto_block_q(q.shape[1]) if block_q is None else block_q
    return _flash_bwd(q, k, v, g, s, block_q=bq, interpret=interpret)


flash_attention.defvjp(_fa_fwd, _fa_bwd)
