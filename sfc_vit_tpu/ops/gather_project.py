"""Fused curve-gather + projection (patch embedding) Pallas kernel.

The curve reorder in every tokenizer is ``take(tokens, lut)`` followed by
a Dense projection.  Unfused, XLA materializes the permuted [B, N, K]
tensor in HBM between the two ops; this kernel keeps everything in VMEM
so reordering costs **zero extra HBM passes** (the BASELINE.md
north-star requirement for the patch-embed path).

TPU-native gather strategy: dynamic row indexing is hostile to Mosaic's
tiled vector layouts (sublane indices must be provably aligned), so the
permutation is realized as a **one-hot matmul on the MXU**:

    onehot[i, n] = (lut_tile[i] == n)          # VPU compare vs iota
    gathered     = onehot @ x[b]               # MXU, VMEM-resident
    out_tile    += gathered @ w_p              # MXU, fused bias

For grouped tokens (the reference's ``'b (n g) d -> b n (g d)'``), the
group dimension becomes a static accumulation over ``g`` one-hot
matmuls against static weight slices -- no in-kernel reshape, no
unaligned shape casts.  The one-hot matmul adds ~N/D extra MXU work,
which for this framework's shapes (N <= ~4k, D >= 64) is noise compared
to the saved HBM round trip.

Backward: custom VJP -- dx scatters through the permutation and both
matmuls run as plain XLA (each is already a single fused GEMM).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kernel_utils import round_up

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


def _kernel(lut_ref, x_ref, w_ref, b_ref, o_ref, *, group: int, k: int):
    x = x_ref[0]  # (N, K) VMEM-resident token matrix for this batch elem
    n = x.shape[0]
    block_n = o_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (block_n, n), 1)
    acc = jnp.zeros((block_n, o_ref.shape[2]), jnp.float32)
    for p in range(group):
        idx = lut_ref[p]  # (block_n, 1) int32, token ids for this slot
        onehot = (idx == col).astype(x.dtype)  # (block_n, N)
        gathered = jax.lax.dot_general(
            onehot, x,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)  # (block_n, K)
        w_p = w_ref[p * k : (p + 1) * k, :]
        acc = acc + jax.lax.dot_general(
            gathered, w_p,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    acc = acc + b_ref[:].astype(jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def gather_project(
    x: jnp.ndarray,
    lut: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    block_n: Optional[int] = None,
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
        block_n: output-token tile; None picks a single-step tile when
            the whole output fits one block (measured on v5e: the
            single-step layout beats XLA take+GEMM at the ViT-B patch
            -embed shape, 2.60 vs 2.72 ms — two steps refetch x and
            lose, RESULTS.md round 2).
        group: curve-consecutive rows concatenated per output token.

    When to fuse (measured): the one-hot gather adds ~N/(group*D) extra
    MXU work, so the kernel wins when the projection is wide (ViT-B:
    N=196, D=768 -> 1.04x) and loses when rows are tiny (grouped pixel
    tokenizers, K=3: 0.52x) — tokenizers gate ``fused`` accordingly.
    """
    if not interpret and jax.default_backend() != "tpu":
        return gather_project_xla(x, lut, w, b, group)
    if block_n is None:
        m = lut.shape[0] // group
        block_n = round_up(m, 8) if m <= 512 else 128
    return _fwd_impl(x, lut, w, b, block_n, interpret, group)


def _fwd_impl(x, lut, w, b, block_n, interpret, group=1):
    bsz, n, k = x.shape
    m = lut.shape[0] // group  # output tokens
    d = w.shape[1]
    bias = jnp.zeros((1, d), w.dtype) if b is None else b.reshape(1, d)
    block_n = min(block_n, round_up(m, 8))
    m_pad = round_up(m, block_n)
    # Host-side re-layout: slot-major (group, M_pad, 1) so the kernel
    # reads each slot's indices as an aligned (block_n, 1) VMEM vector.
    lut_padded = jnp.pad(lut.astype(jnp.int32), (0, (m_pad - m) * group))
    lut2d = lut_padded.reshape(m_pad, group).T.reshape(group, m_pad, 1)

    out = pl.pallas_call(
        functools.partial(_kernel, group=group, k=k),
        grid=(bsz, m_pad // block_n),
        in_specs=[
            pl.BlockSpec(
                (group, block_n, 1), lambda i, j: (0, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, n, k), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (group * k, d), lambda i, j: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, d), lambda i, j: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_n, d), lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, m_pad, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * m_pad * group * k * d
            + 2 * bsz * m_pad * group * n * k,
            bytes_accessed=(
                bsz * n * k * x.dtype.itemsize
                + group * k * d * w.dtype.itemsize
                + bsz * m_pad * d * x.dtype.itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(lut2d, x, w, bias)
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
