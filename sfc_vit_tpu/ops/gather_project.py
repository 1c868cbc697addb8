"""Fused curve-gather + projection (patch embedding) Pallas kernel.

The curve reorder in every tokenizer is ``take(tokens, lut)`` followed by
a Dense projection.  Unfused, XLA materializes the permuted [B, N, K]
tensor in HBM between the two ops; this kernel folds the permutation
into the GEMM's VMEM read pattern so reordering costs **zero extra HBM
passes** (the BASELINE.md north-star requirement for the patch-embed
path):

  * per (batch, row-tile) grid step, the token matrix x[b] sits in VMEM
    (Pallas keeps the block resident across consecutive row tiles);
  * the row tile is gathered VMEM->VMEM by the scalar-prefetched LUT;
  * one MXU GEMM projects the gathered tile; bias is fused.

Sized for this framework's workloads (N <= ~4k tokens, K = patch
features): x[b] is a few hundred KB and fits VMEM comfortably.

Backward: custom VJP -- dx scatters through the inverse permutation and
both matmuls run as plain XLA (they are already single fused GEMMs).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gather_project", "gather_project_xla"]


def gather_project_xla(
    x: jnp.ndarray, lut: jnp.ndarray, w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None, group: int = 1,
) -> jnp.ndarray:
    """Reference path: take-then-(group)-matmul (XLA fuses what it can)."""
    g = jnp.take(x, lut, axis=1)
    bs, rows, k = g.shape
    g = g.reshape(bs, rows // group, group * k)
    out = jnp.einsum(
        "bnk,kd->bnd", g, w, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    return out if b is None else out + b.astype(out.dtype)


def _kernel(lut_ref, x_ref, w_ref, b_ref, o_ref, gathered, *,
            block_n: int, group: int):
    j = pl.program_id(1)
    rows = block_n * group

    def gather_row(r, _):
        src = lut_ref[j * rows + r]
        gathered[pl.ds(r, 1), :] = x_ref[0, pl.ds(src, 1), :]
        return 0

    jax.lax.fori_loop(0, rows, gather_row, 0)
    # token i = concat of its `group` curve-consecutive gathered rows
    # (the reference's  'b (n g) d -> b n (g d)'  grouping).
    tile = gathered[:].reshape(block_n, group * gathered.shape[-1])
    out = jax.lax.dot_general(
        tile, w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out = out + b_ref[:].astype(jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6)
)
def gather_project(
    x: jnp.ndarray,
    lut: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    block_n: int = 128,
    interpret: bool = False,
    group: int = 1,
) -> jnp.ndarray:
    """out[:, i] = concat_g(x[:, lut[i*group + g]]) @ w + b, fused on TPU.

    Args:
        x: [B, N, K] token features.
        lut: [M*group] int32 gather indices into N (a permutation for
            curve reorders; any index list works).
        w: [group*K, D] projection over grouped rows.
        b: optional [D] bias.
        group: curve-consecutive rows concatenated per output token.
    """
    if not interpret and jax.default_backend() != "tpu":
        return gather_project_xla(x, lut, w, b, group)
    return _fwd_impl(x, lut, w, b, block_n, interpret, group)


def _fwd_impl(x, lut, w, b, block_n, interpret, group=1):
    bsz, n, k = x.shape
    m = lut.shape[0] // group  # output tokens
    d = w.shape[1]
    bias = jnp.zeros((1, d), w.dtype) if b is None else b.reshape(1, d)
    block_n = min(block_n, _round_up(m, 8))
    m_pad = _round_up(m, block_n)
    lut_padded = jnp.pad(lut.astype(jnp.int32), (0, (m_pad - m) * group))

    out = pl.pallas_call(
        functools.partial(_kernel, block_n=block_n, group=group),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bsz, m_pad // block_n),
            in_specs=[
                pl.BlockSpec(
                    (1, n, k), lambda i, j, lut: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (group * k, d), lambda i, j, lut: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, d), lambda i, j, lut: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, block_n, d), lambda i, j, lut: (i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[pltpu.VMEM((block_n * group, k), x.dtype)],
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, m_pad, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * m_pad * group * k * d,
            bytes_accessed=(
                bsz * n * k * x.dtype.itemsize
                + k * d * w.dtype.itemsize
                + bsz * m_pad * d * x.dtype.itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(lut_padded, x, w, bias)
    return out[:, :m]


def _gp_fwd(x, lut, w, b, block_n, interpret, group):
    return (
        gather_project(x, lut, w, b, block_n, interpret, group),
        (x, lut, w, b),
    )


def _gp_bwd(block_n, interpret, group, res, g):
    x, lut, w, b = res
    bsz, n, k = x.shape
    g32 = g.astype(jnp.float32)
    xg = jnp.take(x, lut, axis=1).astype(jnp.float32)
    xg = xg.reshape(bsz, lut.shape[0] // group, group * k)
    dw = jnp.einsum("bnk,bnd->kd", xg, g32).astype(w.dtype)
    db = None if b is None else g32.sum(axis=(0, 1)).astype(b.dtype)
    # dx: scatter-add grads back through the gather (permutation-safe
    # and correct for repeated indices too).
    dxg = jnp.einsum("bnd,kd->bnk", g32, w.astype(jnp.float32))
    dxg = dxg.reshape(bsz, lut.shape[0], k)
    dx = (
        jnp.zeros((bsz, n, k), jnp.float32).at[:, lut].add(dxg).astype(x.dtype)
    )
    return dx, None, dw, db


gather_project.defvjp(_gp_fwd, _gp_bwd)
