"""Fused torch-parity multi-head attention (family A) for TRAINING.

One Pallas kernel for the whole ``nn.MultiheadAttention`` training
forward — ``out_proj(prob_dropout(softmax(q kᵀ scale)) v)`` with the
packed in-proj (reference ``vit.py:197-203`` uses torch
``TransformerEncoderLayer`` whose MHA drops attention *probabilities*)
— and a companion backward kernel.

Why: under training with dropout (the flagship protocol,
``main.py:269-314``) ``TorchMultiHeadAttention`` must materialize the
per-head probability tensor to drop it, which forces the explicit
q/k/v head layout.  Profiled at flagship shapes (RESULTS round 3) that
path spends ~8.7 ms/step in pure layout copies (BNHD relayouts + the
stored fp32 probability residual of the store-weights VJP) and ~0.4 ms
relaying the u32 dropout mask — ~22% of the whole train step.  This
kernel keeps q/k/v as lane slices of the packed QKV scratch (no head
transposes), drops probabilities in-register from a 0/1 mask input,
and its backward recomputes the softmax from a saved log-sum-exp so no
[N, N] probability residual ever touches HBM.

The dropout mask is an INPUT, not in-kernel PRNG: mask bits come from
the caller's ``jax.random.bernoulli`` on the flax 'dropout' stream
(hardware ``rng-bit-generator`` under ``dropout_key_impl='auto'``), so
numerics match ``nn.Dropout`` exactly (same key -> same mask), the
backward reuses the identical mask by construction (it is a saved
residual), and the kernel stays CPU-testable in interpret mode
(``pltpu.prng_*`` has no CPU lowering).

Semantics (same math as the module's explicit path given the same
mask — the dropout scaling op is identical ulp-for-ulp since both
DIVIDE by keep, while GEMM/softmax accumulation order differs as in
any kernel-vs-XLA pair, so whole-output parity is tolerance-level):
``qkv = x @ W_in + b_in``; per head ``P = softmax(q kᵀ · scale)`` in
fp32; ``Pd = (P / keep) ⊙ mask``; ``att_h = Pd v``;
``y = att @ W_out + b_out``.  No residual/LN — that is the encoder
layer's business (and the reference applies its *output* dropout
outside the MHA).

Pad semantics: the token axis is padded to a sublane multiple in the
wrapper; padded KEY columns are masked out of every softmax
(``exp(-inf - lse) == 0``) and pad-row cotangents are zeroed before
every grad path, so pad rows contribute nothing anywhere (they are
sliced off the forward output).
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
    bwd_unroll_overhead as _bwd_unroll_overhead,
    round_up as _round_up,
)

__all__ = [
    "fused_torch_mha",
    "mha_train_pallas",
    "torch_mha_train",
    "torch_mha_fits",
    "torch_mha_bwd_fits",
]

_VMEM_LIMIT = 100 * 2 ** 20


def _validate(d: int, in_width: int, heads: int):
    if in_width != 3 * d:
        raise ValueError(
            f"torch MHA packs in_proj as [D, 3D]; got [{d}, {in_width}]"
        )
    if d % heads:
        raise ValueError(f"dim {d} not divisible by heads {heads}")


def _torch_mha_kernel(
    x_ref, win_ref, bin_ref, wout_ref, bout_ref, mask_ref, o_ref, *rest,
    heads: int, dh: int, scale: float, keep: float,
    n_pad: int, n_actual: int, save_acts: bool,
):
    lse_out = None
    if save_acts:
        qkv_out, att_out, lse_out, qkv_s, att_s = rest
    else:
        qkv_s, att_s = rest
    bb = x_ref.shape[0]
    d = x_ref.shape[2]
    inner = heads * dh
    x = x_ref[...].reshape(bb * n_pad, d)

    qkv_s[...] = (
        jax.lax.dot_general(
            x, win_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bin_ref[...].astype(jnp.float32)
    ).astype(x.dtype)

    masked = n_actual < n_pad
    if masked:
        col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
    for bi in range(bb):
        rows = slice(bi * n_pad, (bi + 1) * n_pad)
        blk = qkv_s[rows, :]
        for h in range(heads):
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
            pn = p / l
            if lse_out is not None:
                lse_out[bi, :, h : h + 1] = m + jnp.log(l)
            # nn.Dropout numerics: (P / keep) masked by the 0/1 bits
            # (lax.select(mask, P/keep, 0) == (P/keep) * mask exactly).
            # DIVIDE, don't multiply by a precomputed reciprocal: x/keep
            # and x*(1/keep) round differently in the last ulp, and the
            # XLA rule / module explicit path divide.
            pd = (pn / keep) * mask_ref[bi, h].astype(jnp.float32)
            out = jax.lax.dot_general(
                pd.astype(v.dtype), v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            att_s[rows, h * dh : (h + 1) * dh] = out.astype(att_s.dtype)

    y = (
        jax.lax.dot_general(
            att_s[...], wout_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bout_ref[...].astype(jnp.float32)
    )
    o_ref[...] = y.reshape(bb, n_pad, d).astype(o_ref.dtype)
    if save_acts:
        qkv_out[...] = qkv_s[...].reshape(bb, n_pad, 3 * inner)
        att_out[...] = att_s[...].reshape(bb, n_pad, inner)


def torch_mha_fits(
    n: int, d: int, itemsize: int, heads: int, block_b: int = 4,
    save_acts: bool = True,
) -> bool:
    """VMEM gate for the training forward (weights resident + row tiles
    + qkv/att scratch + the mask tile + streamed saved-acts outputs)."""
    if n > 1024:
        return False  # whole-sequence softmax per image: short-N only
    n_pad = _round_up(n, 16)
    rows = block_b * n_pad
    inner = d
    weights = 2 * (d * 3 * inner + inner * d) * itemsize
    tiles = 4 * rows * d * itemsize
    scratch = rows * 3 * inner * itemsize + rows * inner * itemsize
    mask = 2 * block_b * heads * n_pad * n_pad * itemsize
    if save_acts:
        scratch += 2 * rows * 4 * inner * itemsize
        scratch += 2 * rows * 128 * 4  # streamed lse tile (fp32)
    logits = 3 * n_pad * _round_up(n_pad, 128) * 4
    return weights + tiles + scratch + mask + logits <= 0.6 * _VMEM_LIMIT


@functools.partial(
    jax.jit,
    static_argnames=(
        "heads", "scale", "keep", "block_b", "interpret", "n_actual",
        "save_acts",
    ),
)
def _torch_mha(
    x, w_in, b_in, w_out, b_out, drop_mask,
    heads: int, scale: float, keep: float,
    block_b: int = 4, interpret: bool = False,
    n_actual: Optional[int] = None, save_acts: bool = False,
):
    b, n, d = x.shape
    inner = d
    dh = d // heads
    n_pad = _round_up(n, 16)
    real = n if n_actual is None else n_actual
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
        drop_mask = jnp.pad(
            drop_mask,
            ((0, 0), (0, 0), (0, n_pad - n), (0, n_pad - n)),
        )
    while b % block_b != 0:
        block_b //= 2
    rows = block_b * n_pad
    row2 = lambda a: a.reshape(1, -1)

    tile = lambda w: pl.BlockSpec((block_b, n_pad, w),
                                  lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
    out_specs = tile(d)
    out_shape = jax.ShapeDtypeStruct((b, n_pad, d), x.dtype)
    if save_acts:
        hp = _round_up(heads, 128)
        out_specs = (out_specs, tile(3 * inner), tile(inner), tile(hp))
        out_shape = (
            out_shape,
            jax.ShapeDtypeStruct((b, n_pad, 3 * inner), x.dtype),
            jax.ShapeDtypeStruct((b, n_pad, inner), x.dtype),
            jax.ShapeDtypeStruct((b, n_pad, hp), jnp.float32),
        )
    out = pl.pallas_call(
        functools.partial(
            _torch_mha_kernel, heads=heads, dh=dh, scale=scale,
            keep=keep, n_pad=n_pad, n_actual=real, save_acts=save_acts,
        ),
        grid=(b // block_b,),
        in_specs=[
            tile(d),
            pl.BlockSpec((d, 3 * inner), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * inner), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((inner, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, heads, n_pad, n_pad),
                         lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((rows, 3 * inner), x.dtype),
            pltpu.VMEM((rows, inner), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=(
                2 * b * n_pad * d * 3 * inner
                + 4 * b * heads * n_pad * n_pad * dh
                + 2 * b * n_pad * inner * d
            ),
            bytes_accessed=(
                2 * b * n_pad * d
                + b * heads * n_pad * n_pad
                + d * 3 * inner + inner * d
            ) * x.dtype.itemsize,
            transcendentals=b * heads * n_pad * n_pad,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(x, w_in, row2(b_in), w_out, row2(b_out), drop_mask)
    if save_acts:
        o, qkv, att, lse = out
        return o[:, :n], qkv, att, lse
    return out[:, :n]


def _torch_mha_bwd_kernel(
    x_ref, g_ref, win_ref, wout_ref, mask_ref, qkv_in, att_in, lse_in,
    dx_ref, dwin_ref, dbin_ref, dwout_ref, dbout_ref,
    datt_s, dqkv_s, *,
    heads: int, dh: int, scale: float, keep: float,
    n_pad: int, n_actual: int,
):
    """One image-group tile of the MHA backward.

    Saved by the training forward: the packed QKV projection, per-head
    attention outputs, per-(row, head) log-sum-exp (so the softmax
    recompute is one exp — no reductions, no divide) and the 0/1
    dropout mask (an input the forward already had).  delta uses the
    flash identity ``rowsum(dout ⊙ out)``, which holds with prob
    dropout: ``Σ_k P dP = Σ_k Pd dPd = rowsum(da ⊙ (Pd v))``.
    Parameter grads accumulate in fp32 constant-index output blocks.
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dwin_ref[...] = jnp.zeros(dwin_ref.shape, dwin_ref.dtype)
        dbin_ref[...] = jnp.zeros(dbin_ref.shape, dbin_ref.dtype)
        dwout_ref[...] = jnp.zeros(dwout_ref.shape, dwout_ref.dtype)
        dbout_ref[...] = jnp.zeros(dbout_ref.shape, dbout_ref.dtype)

    bb = x_ref.shape[0]
    d = x_ref.shape[2]
    inner = heads * dh
    rows = bb * n_pad
    x = x_ref[...].reshape(rows, d)
    g = g_ref[...].reshape(rows, d)

    # Pad rows contribute nothing to any grad; their dx is zero (no
    # residual in this kernel — the encoder layer adds x outside).
    masked = n_actual < n_pad
    if masked:
        row = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        in_img = row - (row // n_pad) * n_pad
        gp = jnp.where(in_img < n_actual, g, 0).astype(x.dtype)
    else:
        gp = g

    qkv_all = qkv_in[...].reshape(rows, 3 * inner)
    att_all = att_in[...].reshape(rows, inner)

    dbout_ref[...] += jnp.sum(
        gp.astype(jnp.float32), axis=0, keepdims=True
    )
    dwout_ref[...] += jax.lax.dot_general(
        att_all, gp, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    datt_s[...] = jax.lax.dot_general(
        gp, wout_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)

    if masked:  # hoisted like the forward kernel (one iota, not bb*heads)
        col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
    for bi in range(bb):
        rsl = slice(bi * n_pad, (bi + 1) * n_pad)
        blk = qkv_all[rsl, :]
        for h in range(heads):
            q = blk[:, h * dh : (h + 1) * dh]
            k = blk[:, inner + h * dh : inner + (h + 1) * dh]
            v = blk[:, 2 * inner + h * dh : 2 * inner + (h + 1) * dh]
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            if masked:
                s = jnp.where(col < n_actual, s, _NEG_INF)
            lse = lse_in[bi, :, h : h + 1]
            pf = jnp.exp(s - lse)  # exp(-inf - lse) == 0: pad keys stay 0
            maskf = mask_ref[bi, h].astype(jnp.float32)
            pdf = (pf / keep) * maskf  # divide: see forward kernel note
            da = datt_s[rsl, h * dh : (h + 1) * dh]
            dpd = jax.lax.dot_general(
                da, v, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (N, N) = da @ vᵀ
            dv = jax.lax.dot_general(
                pdf.astype(x.dtype), da,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dp = (dpd / keep) * maskf
            # flash delta identity (holds with the mask, see docstring)
            att_h = att_all[rsl, h * dh : (h + 1) * dh]
            delta = jnp.sum(
                da.astype(jnp.float32) * att_h.astype(jnp.float32),
                axis=1, keepdims=True,
            )
            ds = (pf * (dp - delta) * scale).astype(x.dtype)
            dqkv_s[rsl, h * dh : (h + 1) * dh] = jax.lax.dot_general(
                ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dqkv_s.dtype)
            dqkv_s[rsl, inner + h * dh : inner + (h + 1) * dh] = (
                jax.lax.dot_general(
                    ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(dqkv_s.dtype)
            )
            dqkv_s[rsl, 2 * inner + h * dh : 2 * inner + (h + 1) * dh] = (
                dv.astype(dqkv_s.dtype)
            )

    dbin_ref[...] += jnp.sum(
        dqkv_s[...].astype(jnp.float32), axis=0, keepdims=True
    )
    dwin_ref[...] += jax.lax.dot_general(
        x, dqkv_s[...], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx = jax.lax.dot_general(
        dqkv_s[...], win_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx_ref[...] = dx.reshape(bb, n_pad, d).astype(dx_ref.dtype)


def _bwd_footprint(
    n_pad: int, d: int, itemsize: int, heads: int, block_b: int
) -> int:
    rows = block_b * n_pad
    inner = d
    weights = (d * 3 * inner + inner * d) * itemsize
    accums = (d * 3 * inner + inner * d) * 4 + (3 * inner + d) * 4
    tiles = 6 * rows * d * itemsize  # x + g + dx, double-buffered
    saved = 2 * rows * 4 * inner * itemsize + 2 * rows * 128 * 4
    mask = 2 * block_b * heads * n_pad * n_pad * itemsize
    scratch = rows * 4 * inner * itemsize  # datt + dqkv
    logits = 5 * n_pad * _round_up(n_pad, 128) * 4
    return weights + accums + tiles + saved + mask + scratch + logits


def choose_bwd_block_b(
    b: int, n_pad: int, d: int, itemsize: int, heads: int
) -> int:
    """Largest batch-dividing grid block fitting the footprint model at
    the 0.80 budget AND footprint+unroll-overhead at 0.97 of the full
    limit (the long-N guard; see _bwd_unroll_overhead)."""
    block_b = 8
    while block_b > 1 and (
        b % block_b
        or _bwd_footprint(n_pad, d, itemsize, heads, block_b)
        > 0.80 * _VMEM_LIMIT
        or (_bwd_footprint(n_pad, d, itemsize, heads, block_b)
            + _bwd_unroll_overhead(n_pad)) > 0.97 * _VMEM_LIMIT
    ):
        block_b //= 2
    while b % block_b != 0:
        block_b //= 2
    return block_b


def torch_mha_bwd_fits(
    n: int, d: int, itemsize: int, heads: int, block_b: int = 1
) -> bool:
    if n > 1024:
        return False
    n_pad = _round_up(n, 16)
    fp = _bwd_footprint(n_pad, d, itemsize, heads, block_b)
    return (fp <= 0.80 * _VMEM_LIMIT
            and fp + _bwd_unroll_overhead(n_pad) <= 0.97 * _VMEM_LIMIT)


@functools.partial(
    jax.jit,
    static_argnames=(
        "heads", "scale", "keep", "block_b", "interpret", "n_actual",
    ),
)
def _torch_mha_bwd(
    x, g, w_in, w_out, drop_mask, qkv, att, lse,
    heads: int, scale: float, keep: float,
    block_b: Optional[int] = None, interpret: bool = False,
    n_actual: Optional[int] = None,
):
    b, n, d = x.shape
    inner = d
    dh = d // heads
    n_pad = _round_up(n, 16)
    real = n if n_actual is None else n_actual
    if n_pad != n:
        pad = ((0, 0), (0, n_pad - n), (0, 0))
        x = jnp.pad(x, pad)
        g = jnp.pad(g, pad)
        drop_mask = jnp.pad(
            drop_mask,
            ((0, 0), (0, 0), (0, n_pad - n), (0, n_pad - n)),
        )
        # qkv/att/lse were saved PADDED by the forward
    if block_b is None:
        block_b = choose_bwd_block_b(
            b, n_pad, d, x.dtype.itemsize, heads
        )
    while b % block_b != 0:
        block_b //= 2
    rows = block_b * n_pad

    wtile = lambda w: pl.BlockSpec((block_b, n_pad, w),
                                   lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)
    tile = wtile(d)
    const = lambda *shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    dx, dwin, dbin, dwout, dbout = pl.pallas_call(
        functools.partial(
            _torch_mha_bwd_kernel, heads=heads, dh=dh, scale=scale,
            keep=keep, n_pad=n_pad, n_actual=real,
        ),
        grid=(b // block_b,),
        in_specs=[
            tile, tile,
            const(d, 3 * inner), const(inner, d),
            pl.BlockSpec((block_b, heads, n_pad, n_pad),
                         lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            wtile(3 * inner), wtile(inner), wtile(lse.shape[2]),
        ],
        out_specs=(
            tile,
            const(d, 3 * inner), const(1, 3 * inner),
            const(inner, d), const(1, d),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n_pad, d), x.dtype),
            jax.ShapeDtypeStruct((d, 3 * inner), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * inner), jnp.float32),
            jax.ShapeDtypeStruct((inner, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows, inner), x.dtype),      # datt
            pltpu.VMEM((rows, 3 * inner), x.dtype),  # dqkv
        ],
        cost_estimate=pl.CostEstimate(
            flops=(
                4 * b * n_pad * d * 3 * inner
                + 10 * b * heads * n_pad * n_pad * dh
                + 4 * b * n_pad * inner * d
            ),
            bytes_accessed=(3 * b * n_pad * d * x.dtype.itemsize
                            + 2 * (d * 3 * inner + inner * d) * 4),
            transcendentals=b * heads * n_pad * n_pad,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(x, g, w_in, w_out, drop_mask, qkv, att, lse)

    # dwin/dbin/dwout/dbout come back fp32; the caller casts to the
    # primal dtypes (it holds the bias templates).
    return dx[:, :n], dwin, dbin, dwout, dbout


def torch_mha_train(
    x, w_in, b_in, w_out, b_out, drop_mask,
    heads: int, scale: Optional[float] = None, keep: float = 1.0,
    n_actual: Optional[int] = None,
):
    """The unfused XLA composition with an explicit 0/1 probability
    mask — bit-for-bit what ``TorchMultiHeadAttention``'s
    explicit-weights path computes given the same mask
    (``attention_with_weights`` + ``nn.Dropout`` semantics:
    ``select(mask, P/keep, 0)``).  The differentiated fallback and the
    CPU reference for the kernel's parity tests.  ``n_actual`` masks
    pad KEY columns like the kernel does (pad-row outputs remain
    don't-care, matching the kernel convention)."""
    b, n, d = x.shape
    _validate(d, w_in.shape[1], heads)
    dh = d // heads
    s = dh ** -0.5 if scale is None else scale
    qkv = x @ w_in + b_in
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, n, heads, dh)
    k = k.reshape(b, n, heads, dh)
    v = v.reshape(b, n, heads, dh)
    logits = jnp.einsum(
        "bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32
    ).astype(jnp.float32) * s
    if n_actual is not None and n_actual < n:
        col = jnp.arange(n)[None, None, None, :]
        logits = jnp.where(col < n_actual, logits, _NEG_INF)
    w = jax.nn.softmax(logits, axis=-1)
    if drop_mask is not None:
        w = jnp.where(drop_mask.astype(bool), w / keep, 0.0)
    out = jnp.einsum("bhnm,bmhd->bnhd", w.astype(v.dtype), v)
    return out.reshape(b, n, d) @ w_out + b_out


def mha_train_pallas(train_impl: str, n: int, d: int, heads: int,
                     itemsize: int, interpret: bool) -> bool:
    """True iff the fused train kernel (fwd + bwd) is the right
    implementation for these shapes on this backend.  The SINGLE
    eligibility predicate — `TorchMultiHeadAttention` and the
    custom-vjp routing both call it, so the module-level gate and the
    kernel-level gate cannot drift apart."""
    if train_impl == "pallas":
        return True
    if train_impl != "auto":
        return False
    on_tpu = jax.default_backend() == "tpu"
    return (
        (on_tpu or interpret)
        and d % 128 == 0
        and torch_mha_bwd_fits(n, d, itemsize, heads)
        and torch_mha_fits(n, d, itemsize, heads, save_acts=True)
    )


_mha_train_pallas = mha_train_pallas  # internal alias (pre-rename)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def fused_torch_mha(
    x: jnp.ndarray,
    w_in: jnp.ndarray,
    b_in: jnp.ndarray,
    w_out: jnp.ndarray,
    b_out: jnp.ndarray,
    drop_mask: jnp.ndarray,
    heads: int,
    scale: Optional[float] = None,
    keep: float = 1.0,
    interpret: bool = False,
    n_actual: Optional[int] = None,
    train_impl: str = "auto",
) -> jnp.ndarray:
    """Torch-parity MHA with probability dropout as ONE TPU kernel.

    ``drop_mask`` is the 0/1 keep mask ``[B, heads, N, N]`` (any dtype;
    sample with ``jax.random.bernoulli`` on the module's 'dropout'
    stream) and ``keep = 1 - rate``; its cotangent is defined as zero
    (PRNG output — nothing upstream to train).  Under differentiation
    (``train_impl='auto'`` on TPU, gated on :func:`torch_mha_fits` /
    :func:`torch_mha_bwd_fits`) both directions are Pallas kernels and
    no [N, N] probability residual touches HBM; otherwise the XLA
    composition :func:`torch_mha_train` is differentiated.

    Mirrors torch ``nn.MultiheadAttention`` training semantics
    (reference usage: ``vit.py:197-203`` via TransformerEncoderLayer).
    """
    _check_args(x, w_in, heads, keep)
    # Route exactly like the differentiated path (_ftm_fwd): jax only
    # runs this primal body when the call is NOT differentiated (eval-
    # mode losses, value-only applies) — an unconditional kernel lower
    # here would ignore train_impl='xla' and the VMEM fits gates.
    if _mha_train_pallas(train_impl, x.shape[1], x.shape[2], heads,
                         x.dtype.itemsize, interpret):
        dh = x.shape[-1] // heads
        s = dh ** -0.5 if scale is None else scale
        return _torch_mha(
            x, w_in, b_in, w_out, b_out, drop_mask,
            heads=heads, scale=s, keep=keep, interpret=interpret,
            n_actual=n_actual,
        )
    return torch_mha_train(
        x, w_in, b_in, w_out, b_out, drop_mask,
        heads=heads, scale=scale, keep=keep, n_actual=n_actual,
    )


def _check_args(x, w_in, heads, keep):
    """Shared by the primal AND the custom-vjp forward: jax.grad never
    executes the primal body, so guards that live only there are dead
    on every differentiated call — the one path a training kernel is
    built for (review finding)."""
    if keep <= 0.0:
        raise ValueError(
            "fused_torch_mha requires keep > 0 (dropout rate < 1); "
            "rate=1.0 means the attention output is all zeros -- use "
            "nn.Dropout / the explicit-weights path for that."
        )
    _validate(x.shape[-1], w_in.shape[1], heads)


def _ftm_fwd(x, w_in, b_in, w_out, b_out, drop_mask,
             heads, scale, keep, interpret, n_actual, train_impl):
    _check_args(x, w_in, heads, keep)
    d = x.shape[2]
    if _mha_train_pallas(train_impl, x.shape[1], d, heads,
                         x.dtype.itemsize, interpret):
        dh = d // heads
        s = dh ** -0.5 if scale is None else scale
        out, qkv, att, lse = _torch_mha(
            x, w_in, b_in, w_out, b_out, drop_mask,
            heads=heads, scale=s, keep=keep, interpret=interpret,
            n_actual=n_actual, save_acts=True,
        )
        return out, (x, w_in, b_in, w_out, b_out, drop_mask, qkv, att,
                     lse)
    out, vjp = jax.vjp(
        lambda xx, wi, bi, wo, bo: torch_mha_train(
            xx, wi, bi, wo, bo, drop_mask,
            heads=heads, scale=scale, keep=keep, n_actual=n_actual,
        ),
        x, w_in, b_in, w_out, b_out,
    )
    return out, (vjp, drop_mask)


def _ftm_bwd(heads, scale, keep, interpret, n_actual, train_impl, res, g):
    if callable(res[0]):  # XLA rule
        vjp, drop_mask = res
        dx, dwin, dbin, dwout, dbout = vjp(g)
        return dx, dwin, dbin, dwout, dbout, jnp.zeros_like(drop_mask)
    x, w_in, b_in, w_out, b_out, drop_mask, qkv, att, lse = res
    d = x.shape[2]
    dh = d // heads
    s = dh ** -0.5 if scale is None else scale
    dx, dwin, dbin, dwout, dbout = _torch_mha_bwd(
        x, g, w_in, w_out, drop_mask, qkv, att, lse,
        heads=heads, scale=s, keep=keep, interpret=interpret,
        n_actual=n_actual,
    )
    cast = lambda a, like: a.reshape(like.shape).astype(like.dtype)
    return (dx, cast(dwin, w_in), cast(dbin, b_in),
            cast(dwout, w_out), cast(dbout, b_out),
            jnp.zeros_like(drop_mask))


fused_torch_mha.defvjp(_ftm_fwd, _ftm_bwd)
