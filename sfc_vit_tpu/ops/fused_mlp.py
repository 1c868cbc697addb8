"""Fused transformer-MLP block: one Pallas kernel for
``x + fc2(act(fc1(LN(x))))``.

Why: profiling the ViT-B/16 forward after the packed-QKV kernel
(scripts/profile_forward.py + the compiled HLO) showed the per-layer
MLP work — XLA emits it as an fc1 mega-fusion plus an fc2
``convert_reduce_fusion`` that also computes the next LayerNorm's fp32
stats — measuring ~6 ms/layer against a ~2.6 ms roofline (474 GFLOP of
GEMM at the 160 TF/s measured envelope + one 308 MB HBM pass).  The
separate stats reduce and the conv-style GEMM emission leave ~half the
time on the table.

Design (TPU-first):
  * grid over row tiles of the flattened ``[B*N, D]`` activations; each
    step: LayerNorm (fp32 stats, eps/scale/bias identical to flax
    ``nn.LayerNorm``) -> ``xn @ W1 + b1`` -> exact ``gelu`` (erf) or
    ``relu`` -> ``@ W2 + b2`` -> ``+ x`` (residual), all VMEM-resident.
  * W1/W2 blocks have constant index maps, so Mosaic fetches them once
    and keeps them resident across the row grid — HBM traffic is one
    read + one write of x (the hidden activation NEVER touches HBM,
    vs 2 reads + 2 writes of the 4x-wider hidden in the unfused graph).
  * fp32 accumulation on the MXU for both GEMMs.  The fc1 accumulator
    stays fp32 THROUGH the activation (the unfused graph rounds it to
    the input dtype first) — strictly tighter numerics and measured
    -0.4 ms/layer (RESULTS.md round 2); the activation output and the
    final sum round to the input dtype as usual.

Backward (round 3): a second Pallas kernel.  The round-2 custom_vjp
fell back to the unfused XLA formula under differentiation, which
stores the [R, F] hidden activations as residuals — at ViT-B batch 256
that is ~2 HBM round-trips of a 4x-wider tensor per layer, and the
train step measured 933 img/s with *inverted* batch scaling
(bs64 > bs256; VERDICT round 2 item 1).  The Pallas backward saves
ONLY the block input x, recomputes LN/fc1/act per row tile in VMEM
(one extra GEMM: 5 bwd GEMMs vs the minimal 4), and accumulates
dW1/dW2/db/dLN in fp32 VMEM across the row grid — HBM traffic is one
read of x + one read of g + one write of dx, with no [R, F] tensor
ever materialized.  The differentiated forward is the forward kernel
itself, so training runs the same fast path as inference.
``train_impl='xla'`` (or non-TPU backends without ``interpret``)
restores the round-2 store-residuals XLA rule.

Reference scope: the reference's MLP is torch ``Linear->GELU->Linear``
inside pre-norm blocks (``altvit.py:102-113``); this kernel implements
the same math, re-scheduled for the MXU/VMEM.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kernel_utils import ln_fp32 as _ln_fp32, round_up as _round_up

__all__ = [
    "fused_mlp_block", "mlp_block_xla", "fused_mlp_fits",
    "fused_mlp_bwd_fits",
    "fused_postnorm_tail", "postnorm_tail_xla", "postnorm_tail_fits",
]


def _erf(x):
    """erf from Mosaic-supported primitives (no ``erf`` lowering on TPU
    Pallas): Abramowitz & Stegun 7.1.26, max abs error 1.5e-7 — below
    fp32 gelu noise and 4 orders under the bf16 rounding the outputs
    get anyway."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _act(h, activation: str):
    if activation == "gelu":
        # exact-erf gelu, matching nn.gelu(approximate=False)
        return h * 0.5 * (1.0 + _erf(h * (2.0 ** -0.5)))
    if activation == "relu":
        return jnp.maximum(h, 0.0)
    raise ValueError(f"unsupported activation {activation!r}")


_INV_SQRT_2PI = 0.3989422804014327


def _dact(z, activation: str):
    """act'(z) in fp32; gelu' = Phi(z) + z*phi(z) (exact-erf gelu)."""
    if activation == "gelu":
        phi = jnp.exp(z * z * -0.5) * _INV_SQRT_2PI
        return 0.5 * (1.0 + _erf(z * (2.0 ** -0.5))) + z * phi
    if activation == "relu":
        return (z > 0.0).astype(z.dtype)
    raise ValueError(f"unsupported activation {activation!r}")


def _mlp_kernel(
    x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
    *z_out, eps: float, activation: str, residual: bool,
):
    x = x_ref[...]  # (BR, D) input dtype
    xf = x.astype(jnp.float32)
    # LayerNorm, flax semantics: fp32 mean/var over the feature axis,
    # fast-variance form (E[x^2] - E[x]^2), scale+bias, round to dtype.
    mean = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=1, keepdims=True) - mean * mean, 0.0
    )
    inv = jax.lax.rsqrt(var + eps)
    xn = (xf - mean) * inv
    xn = xn * lns_ref[...].astype(jnp.float32) + lnb_ref[...].astype(
        jnp.float32
    )
    xn = xn.astype(x.dtype)  # round where flax's LN output rounds

    h = jax.lax.dot_general(
        xn, w1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    h = h + b1_ref[...].astype(jnp.float32)
    if z_out:  # training fwd: save pre-activation for the 4-GEMM bwd
        z_out[0][...] = h.astype(z_out[0].dtype)
    # fc1 output stays fp32 through the activation (the unfused graph
    # rounds it to bf16 first; skipping that round-trip is strictly
    # tighter numerics and measured -0.4 ms/layer, /tmp decomposition
    # table in RESULTS.md round 2)
    h = _act(h, activation).astype(x.dtype)

    y = jax.lax.dot_general(
        h, w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y = y + b2_ref[...].astype(jnp.float32)
    if residual:
        y = y + xf
    o_ref[...] = y.astype(o_ref.dtype)


#: The kernel raises the scoped-VMEM limit per-call (v5e has 128 MB
#: physical VMEM; the 16 MB default is just XLA's scoped budget), so
#: the gate checks against _VMEM_LIMIT with double-buffered weights
#: (conservative: Mosaic single-buffers constant-index blocks).
_VMEM_LIMIT = 100 * 2 ** 20


def fused_mlp_fits(
    d: int, f: int, itemsize: int, block_r: int = 256,
    save_z: bool = False,
) -> bool:
    weights = 2 * (2 * d * f * itemsize)
    tiles = 4 * block_r * d * itemsize  # x + out, double-buffered
    hidden = block_r * f * 4 + block_r * f * itemsize
    if save_z:  # training forward streams z out, double-buffered
        hidden += 2 * block_r * f * itemsize
    ln_tmp = 2 * block_r * d * 4
    return weights + tiles + hidden + ln_tmp <= 0.6 * _VMEM_LIMIT


@functools.partial(
    jax.jit,
    static_argnames=("eps", "activation", "residual", "block_r",
                     "interpret", "save_z"),
)
def _fused_mlp(
    x, ln_scale, ln_bias, w1, b1, w2, b2,
    eps: float, activation: str, residual: bool,
    block_r: int = 256, interpret: bool = False, save_z: bool = False,
):
    b, n, d = x.shape
    f = w1.shape[1]
    r = b * n
    xr = x.reshape(r, d)
    r_pad = _round_up(r, block_r)
    if r_pad != r:
        xr = jnp.pad(xr, ((0, r_pad - r), (0, 0)))
    row2 = lambda a: a.reshape(1, -1)  # (1, D)/(1, F) lane vectors

    rowspec = pl.BlockSpec((block_r, d), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    zspec = pl.BlockSpec((block_r, f), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    out_specs = (rowspec, zspec) if save_z else rowspec
    out_shape = (
        (jax.ShapeDtypeStruct((r_pad, d), x.dtype),
         jax.ShapeDtypeStruct((r_pad, f), x.dtype))
        if save_z else jax.ShapeDtypeStruct((r_pad, d), x.dtype)
    )
    res = pl.pallas_call(
        functools.partial(
            _mlp_kernel, eps=eps, activation=activation,
            residual=residual,
        ),
        grid=(r_pad // block_r,),
        in_specs=[
            rowspec,
            pl.BlockSpec((1, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, f), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=4 * r_pad * d * f,
            bytes_accessed=(2 * r_pad * d + 2 * d * f) * x.dtype.itemsize
            + (r_pad * f * x.dtype.itemsize if save_z else 0),
            transcendentals=r_pad * f,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(xr, row2(ln_scale), row2(ln_bias), w1, row2(b1), w2, row2(b2))
    if save_z:
        out, z = res
        return out[:r].reshape(b, n, d), z[:r].reshape(b, n, f)
    return res[:r].reshape(b, n, d)


def _mlp_bwd_kernel(
    x_ref, g_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref,
    *refs, eps: float, activation: str, residual: bool,
    with_z: bool = False,
):
    """One row-tile of the fused-MLP backward.

    Recomputes LN (and, without ``with_z``, the fc1 GEMM) from the
    saved block input x, then produces dx for this tile and accumulates
    the parameter grads in fp32 VMEM across the row grid
    (constant-index output blocks, written back once at the end).

    ``with_z``: the training forward saved the pre-activation z (one
    extra HBM write there), so this kernel runs 4 GEMMs instead of 5 —
    measured as the bs-64 train lever (the MLP backward is otherwise AT
    the GEMM roofline).
    """
    if with_z:
        (z_ref, dx_ref, dw1_ref, dw2_ref, db1_ref, db2_ref, dls_ref,
         dlb_ref) = refs
    else:
        (dx_ref, dw1_ref, dw2_ref, db1_ref, db2_ref, dls_ref,
         dlb_ref) = refs
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dw1_ref[...] = jnp.zeros(dw1_ref.shape, dw1_ref.dtype)
        dw2_ref[...] = jnp.zeros(dw2_ref.shape, dw2_ref.dtype)
        db1_ref[...] = jnp.zeros(db1_ref.shape, db1_ref.dtype)
        db2_ref[...] = jnp.zeros(db2_ref.shape, db2_ref.dtype)
        dls_ref[...] = jnp.zeros(dls_ref.shape, dls_ref.dtype)
        dlb_ref[...] = jnp.zeros(dlb_ref.shape, dlb_ref.dtype)

    x = x_ref[...]  # (BR, D)
    g = g_ref[...]
    xf = x.astype(jnp.float32)
    gf = g.astype(jnp.float32)

    # --- recompute the forward (same numerics as _mlp_kernel) ---
    mean = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=1, keepdims=True) - mean * mean, 0.0
    )
    inv = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * inv  # pre-scale normalized rows, fp32
    lns = lns_ref[...].astype(jnp.float32)
    xn = (xhat * lns + lnb_ref[...].astype(jnp.float32)).astype(x.dtype)

    if with_z:
        z = z_ref[...].astype(jnp.float32)
    else:
        z = jax.lax.dot_general(
            xn, w1_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[...].astype(jnp.float32)  # fp32, kept through act'
    h = _act(z, activation).astype(x.dtype)

    # --- backward ---
    db2_ref[...] += jnp.sum(gf, axis=0, keepdims=True)
    dw2_ref[...] += jax.lax.dot_general(
        h, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (F, D)
    dh = jax.lax.dot_general(
        g, w2_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BR, F)
    dz = dh * _dact(z, activation)
    db1_ref[...] += jnp.sum(dz, axis=0, keepdims=True)
    dzc = dz.astype(x.dtype)  # round where XLA's bwd GEMM operands round
    dw1_ref[...] += jax.lax.dot_general(
        xn, dzc, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (D, F)
    dxn = jax.lax.dot_general(
        dzc, w1_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BR, D)
    dls_ref[...] += jnp.sum(dxn * xhat, axis=0, keepdims=True)
    dlb_ref[...] += jnp.sum(dxn, axis=0, keepdims=True)
    dxh = dxn * lns
    m1 = jnp.mean(dxh, axis=1, keepdims=True)
    m2 = jnp.mean(dxh * xhat, axis=1, keepdims=True)
    dxf = inv * (dxh - m1 - xhat * m2)
    if residual:
        dxf = dxf + gf
    dx_ref[...] = dxf.astype(dx_ref.dtype)


def fused_mlp_bwd_fits(
    d: int, f: int, itemsize: int, block_r: int = 256
) -> bool:
    """VMEM gate for the backward kernel: resident bf16 weights + fp32
    dW accumulators + streamed x/g/dx tiles + the fp32 [BR, F] hidden
    temporaries (z, dh, dz live simultaneously)."""
    weights = 2 * d * f * itemsize          # w1 + w2 (const blocks)
    accums = 2 * d * f * 4 + 2 * f * 4 + 4 * d * 4
    tiles = 6 * block_r * d * itemsize      # x + g + dx, double-buffered
    # z streamed in (saved-z 4-GEMM path), double-buffered
    hidden = (3 * block_r * f * 4
              + 4 * block_r * f * itemsize)
    row_tmp = 6 * block_r * d * 4           # xhat/xn/dxn/dxh/dxf fp32-ish
    return weights + accums + tiles + hidden + row_tmp <= 0.6 * _VMEM_LIMIT


@functools.partial(
    jax.jit,
    static_argnames=("eps", "activation", "residual", "block_r",
                     "interpret"),
)
def _fused_mlp_bwd(
    x, g, ln_scale, ln_bias, w1, b1, w2,
    eps: float, activation: str, residual: bool,
    block_r: int = 256, interpret: bool = False, z=None, b2=None,
):
    # b2 is numerically unused (db2 = colsum(g)); it is threaded through
    # only so the cotangent keeps b2's OWN dtype (casting to w2.dtype
    # breaks custom_vjp's aval check for callers with, say, bf16 weights
    # and fp32 biases). None falls back to w2's dtype (legacy probes).
    b, n, d = x.shape
    f = w1.shape[1]
    r = b * n
    xr = x.reshape(r, d)
    gr = g.reshape(r, d)
    r_pad = _round_up(r, block_r)
    if r_pad != r:
        # zero g pad rows => zero contribution to every param grad
        xr = jnp.pad(xr, ((0, r_pad - r), (0, 0)))
        gr = jnp.pad(gr, ((0, r_pad - r), (0, 0)))
    row2 = lambda a: a.reshape(1, -1)

    rowspec = pl.BlockSpec((block_r, d), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    const = lambda *shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    operands = [xr, gr, row2(ln_scale), row2(ln_bias), w1, row2(b1), w2]
    in_specs = [
        rowspec, rowspec,
        const(1, d), const(1, d),
        const(d, f), const(1, f), const(f, d),
    ]
    if z is not None:
        zr = z.reshape(r, f)
        if r_pad != r:
            zr = jnp.pad(zr, ((0, r_pad - r), (0, 0)))
        operands.append(zr)
        in_specs.append(pl.BlockSpec((block_r, f), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
    dx, dw1, dw2, db1, db2, dls, dlb = pl.pallas_call(
        functools.partial(
            _mlp_bwd_kernel, eps=eps, activation=activation,
            residual=residual, with_z=z is not None,
        ),
        grid=(r_pad // block_r,),
        in_specs=in_specs,
        out_specs=(
            rowspec,
            const(d, f), const(f, d),
            const(1, f), const(1, d), const(1, d), const(1, d),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r_pad, d), x.dtype),
            jax.ShapeDtypeStruct((d, f), jnp.float32),
            jax.ShapeDtypeStruct((f, d), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=(8 if z is not None else 10) * r_pad * d * f,
            bytes_accessed=(3 * r_pad * d + 2 * d * f) * x.dtype.itemsize
            + 2 * d * f * 4
            + (r_pad * f * x.dtype.itemsize if z is not None else 0),
            transcendentals=2 * r_pad * f,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(*operands)

    cast = lambda a, like: a.reshape(like.shape).astype(like.dtype)
    return (
        dx[:r].reshape(b, n, d),
        cast(dls, ln_scale), cast(dlb, ln_bias),
        cast(dw1, w1), cast(db1, b1),
        cast(dw2, w2), cast(db2, b2 if b2 is not None else w2[0]),
    )


def mlp_block_xla(
    x, ln_scale, ln_bias, w1, b1, w2, b2,
    eps: float = 1e-5, activation: str = "gelu", residual: bool = True,
):
    """Unfused reference formula (flax Dense/LayerNorm semantics); the
    differentiated forward of the custom VJP and the CPU fallback."""
    xn = _ln_fp32(x, ln_scale, ln_bias, eps)
    h = (xn @ w1 + b1.astype(x.dtype)).astype(x.dtype)
    if activation == "gelu":
        h = jax.nn.gelu(h, approximate=False)
    else:
        h = jax.nn.relu(h)
    y = (h @ w2 + b2.astype(x.dtype)).astype(x.dtype)
    return x + y if residual else y


def _mlp_train_pallas(train_impl: str, d: int, f: int, itemsize: int,
                      interpret: bool) -> bool:
    """Trace-time choice of training rule.

    'pallas' forces the kernel pair; 'xla' forces the round-2
    store-residuals XLA rule; 'auto' takes the kernels on TPU (or in
    interpret mode, so the hermetic CPU suite exercises them) when the
    backward fits VMEM and the feature dims are lane-aligned."""
    if train_impl == "pallas":
        return True
    if train_impl != "auto":
        return False
    on_tpu = jax.default_backend() == "tpu"
    return (
        (on_tpu or interpret)
        and d % 128 == 0 and f % 128 == 0
        and fused_mlp_bwd_fits(d, f, itemsize)
        # the training forward streams z out — it must fit too
        and fused_mlp_fits(d, f, itemsize, save_z=True)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def fused_mlp_block(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    eps: float = 1e-5,
    activation: str = "gelu",
    residual: bool = True,
    interpret: bool = False,
    train_impl: str = "auto",
) -> jnp.ndarray:
    """``x + fc2(act(fc1(LN(x))))`` as ONE TPU kernel ([B, N, D] in/out).

    Under differentiation (``train_impl='auto'`` on TPU) the forward
    IS this kernel and the backward is the companion Pallas kernel
    (:func:`_fused_mlp_bwd`): only x is saved, the hidden activation is
    recomputed in VMEM, parameter grads accumulate in fp32 on-chip.
    ``train_impl='xla'`` restores the round-2 rule (differentiate the
    unfused :func:`mlp_block_xla`, store-residuals).  Call sites gate
    on :func:`fused_mlp_fits`.
    """
    return _fused_mlp(
        x, ln_scale, ln_bias, w1, b1, w2, b2,
        eps=eps, activation=activation, residual=residual,
        interpret=interpret,
    )


def _fm_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2,
            eps, activation, residual, interpret, train_impl):
    d, f = w1.shape
    if _mlp_train_pallas(train_impl, d, f, x.dtype.itemsize, interpret):
        out, z = _fused_mlp(
            x, ln_scale, ln_bias, w1, b1, w2, b2,
            eps=eps, activation=activation, residual=residual,
            interpret=interpret, save_z=True,
        )
        return out, (x, ln_scale, ln_bias, w1, b1, w2, b2, z)
    out, vjp = jax.vjp(
        lambda *a: mlp_block_xla(
            *a, eps=eps, activation=activation, residual=residual
        ),
        x, ln_scale, ln_bias, w1, b1, w2, b2,
    )
    return out, vjp


def _fm_bwd(eps, activation, residual, interpret, train_impl, res, g):
    if callable(res):  # XLA rule: res is the jax.vjp closure
        return res(g)
    x, ln_scale, ln_bias, w1, b1, w2, b2, z = res
    dx, dls, dlb, dw1, db1, dw2, db2 = _fused_mlp_bwd(
        x, g, ln_scale, ln_bias, w1, b1, w2,
        eps=eps, activation=activation, residual=residual,
        interpret=interpret, z=z, b2=b2,
    )
    return dx, dls, dlb, dw1, db1, dw2, db2


fused_mlp_block.defvjp(_fm_fwd, _fm_bwd)


# ---------------------------------------------------------------------
# Post-norm layer tail (family A, torch nn.TransformerEncoderLayer
# semantics, vit.py:197-203):
#     x2 = LN1(x + attn_out)
#     out = LN2(x2 + fc2(act(fc1(x2))))
# Everything after the attention projection as ONE kernel — two
# LayerNorms, both MLP GEMMs, both residuals; the hidden activation and
# both residual sums never touch HBM.  The attention half stays with
# ops.attention.packed_qkv_attention (its own kernel).
# ---------------------------------------------------------------------


def _postnorm_tail_kernel(
    x_ref, a_ref, ln1s_ref, ln1b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    ln2s_ref, ln2b_ref, o_ref, *saves, eps: float, activation: str,
):
    xf = x_ref[...].astype(jnp.float32)
    af = a_ref[...].astype(jnp.float32)
    s1 = xf + af
    mean = jnp.mean(s1, axis=1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(s1 * s1, axis=1, keepdims=True) - mean * mean, 0.0
    )
    x2f = (s1 - mean) * jax.lax.rsqrt(var + eps)
    x2f = x2f * ln1s_ref[...].astype(jnp.float32) + ln1b_ref[...].astype(
        jnp.float32
    )
    x2 = x2f.astype(x_ref.dtype)  # round where nn.LayerNorm rounds

    h = jax.lax.dot_general(
        x2, w1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    h = h + b1_ref[...].astype(jnp.float32)
    if saves:  # training fwd: save z + pre-LN2 sum for the bwd kernel
        saves[0][...] = h.astype(saves[0].dtype)
    h = _act(h, activation).astype(x_ref.dtype)

    y = jax.lax.dot_general(
        h, w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s2 = y + b2_ref[...].astype(jnp.float32) + x2f
    if saves:
        saves[1][...] = s2.astype(saves[1].dtype)
    mean2 = jnp.mean(s2, axis=1, keepdims=True)
    var2 = jnp.maximum(
        jnp.mean(s2 * s2, axis=1, keepdims=True) - mean2 * mean2, 0.0
    )
    o = (s2 - mean2) * jax.lax.rsqrt(var2 + eps)
    o = o * ln2s_ref[...].astype(jnp.float32) + ln2b_ref[...].astype(
        jnp.float32
    )
    o_ref[...] = o.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("eps", "activation", "block_r", "interpret",
                     "save_acts"),
)
def _postnorm_tail(
    x, attn_out, ln1_s, ln1_b, w1, b1, w2, b2, ln2_s, ln2_b,
    eps: float, activation: str,
    block_r: int = 256, interpret: bool = False,
    save_acts: bool = False,
):
    b, n, d = x.shape
    f = w1.shape[1]
    r = b * n
    xr = x.reshape(r, d)
    ar = attn_out.reshape(r, d)
    r_pad = _round_up(r, block_r)
    if r_pad != r:
        xr = jnp.pad(xr, ((0, r_pad - r), (0, 0)))
        ar = jnp.pad(ar, ((0, r_pad - r), (0, 0)))
    row2 = lambda a: a.reshape(1, -1)

    rowspec = pl.BlockSpec((block_r, d), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    zspec = pl.BlockSpec((block_r, f), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    vec = lambda w: pl.BlockSpec((1, w), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    out_specs = (rowspec, zspec, rowspec) if save_acts else rowspec
    out_shape = (
        (jax.ShapeDtypeStruct((r_pad, d), x.dtype),
         jax.ShapeDtypeStruct((r_pad, f), x.dtype),
         jax.ShapeDtypeStruct((r_pad, d), x.dtype))
        if save_acts else jax.ShapeDtypeStruct((r_pad, d), x.dtype)
    )
    res = pl.pallas_call(
        functools.partial(
            _postnorm_tail_kernel, eps=eps, activation=activation,
        ),
        grid=(r_pad // block_r,),
        in_specs=[
            rowspec, rowspec, vec(d), vec(d),
            pl.BlockSpec((d, f), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            vec(f),
            pl.BlockSpec((f, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            vec(d), vec(d), vec(d),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=4 * r_pad * d * f,
            bytes_accessed=(3 * r_pad * d + 2 * d * f) * x.dtype.itemsize
            + (r_pad * (f + d) * x.dtype.itemsize if save_acts else 0),
            transcendentals=r_pad * f,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(xr, ar, row2(ln1_s), row2(ln1_b), w1, row2(b1), w2, row2(b2),
      row2(ln2_s), row2(ln2_b))
    if save_acts:
        o, z, s2 = res
        return (o[:r].reshape(b, n, d), z[:r].reshape(b, n, f),
                s2[:r].reshape(b, n, d))
    return res[:r].reshape(b, n, d)


def _postnorm_tail_bwd_kernel(
    x_ref, a_ref, g_ref, z_ref, s2_ref,
    ln1s_ref, ln1b_ref, w1_ref, w2_ref, ln2s_ref, ln2b_ref,
    ds_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
    dls1_ref, dlb1_ref, dls2_ref, dlb2_ref,
    *, eps: float, activation: str,
):
    """Postnorm-tail backward: 4 GEMMs, no recompute GEMMs (the
    training forward saved z and the pre-LN2 sum s2).  Both LN
    normalizations are re-derived cheaply from x+a / s2.  ``ds_ref``
    is the shared cotangent of x AND attn_out (they only enter via
    x + attn_out)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        for ref in (dw1_ref, db1_ref, dw2_ref, db2_ref,
                    dls1_ref, dlb1_ref, dls2_ref, dlb2_ref):
            ref[...] = jnp.zeros(ref.shape, ref.dtype)

    xf = x_ref[...].astype(jnp.float32)
    af = a_ref[...].astype(jnp.float32)
    gf = g_ref[...].astype(jnp.float32)
    z = z_ref[...].astype(jnp.float32)
    s2 = s2_ref[...].astype(jnp.float32)

    # LN1 stats from x + a
    s1 = xf + af
    m1 = jnp.mean(s1, axis=1, keepdims=True)
    v1 = jnp.maximum(
        jnp.mean(s1 * s1, axis=1, keepdims=True) - m1 * m1, 0.0
    )
    inv1 = jax.lax.rsqrt(v1 + eps)
    xhat1 = (s1 - m1) * inv1
    ls1 = ln1s_ref[...].astype(jnp.float32)
    x2 = (xhat1 * ls1 + ln1b_ref[...].astype(jnp.float32)).astype(
        x_ref.dtype
    )
    h = _act(z, activation).astype(x_ref.dtype)

    # LN2 stats from the saved s2
    m2 = jnp.mean(s2, axis=1, keepdims=True)
    v2 = jnp.maximum(
        jnp.mean(s2 * s2, axis=1, keepdims=True) - m2 * m2, 0.0
    )
    inv2 = jax.lax.rsqrt(v2 + eps)
    xhat2 = (s2 - m2) * inv2

    # --- LN2 backward ---
    dls2_ref[...] += jnp.sum(gf * xhat2, axis=0, keepdims=True)
    dlb2_ref[...] += jnp.sum(gf, axis=0, keepdims=True)
    dxh2 = gf * ln2s_ref[...].astype(jnp.float32)
    mm1 = jnp.mean(dxh2, axis=1, keepdims=True)
    mm2 = jnp.mean(dxh2 * xhat2, axis=1, keepdims=True)
    ds2 = inv2 * (dxh2 - mm1 - xhat2 * mm2)

    # --- fc2 / act / fc1 backward ---
    db2_ref[...] += jnp.sum(ds2, axis=0, keepdims=True)
    ds2_b = ds2.astype(x_ref.dtype)
    dw2_ref[...] += jax.lax.dot_general(
        h, ds2_b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dh = jax.lax.dot_general(
        ds2_b, w2_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dz = dh * _dact(z, activation)
    db1_ref[...] += jnp.sum(dz, axis=0, keepdims=True)
    dzc = dz.astype(x_ref.dtype)
    dw1_ref[...] += jax.lax.dot_general(
        x2, dzc, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # x2f feeds BOTH fc1 and the residual into s2
    dx2 = jax.lax.dot_general(
        dzc, w1_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + ds2

    # --- LN1 backward ---
    dls1_ref[...] += jnp.sum(dx2 * xhat1, axis=0, keepdims=True)
    dlb1_ref[...] += jnp.sum(dx2, axis=0, keepdims=True)
    dxh1 = dx2 * ls1
    n1 = jnp.mean(dxh1, axis=1, keepdims=True)
    n2 = jnp.mean(dxh1 * xhat1, axis=1, keepdims=True)
    ds_ref[...] = (inv1 * (dxh1 - n1 - xhat1 * n2)).astype(ds_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("eps", "activation", "block_r", "interpret"),
)
def _postnorm_tail_bwd(
    x, attn_out, g, z, s2, ln1_s, ln1_b, w1, b1, w2, ln2_s, ln2_b,
    eps: float, activation: str,
    block_r: int = 256, interpret: bool = False, b2=None,
):
    # b2: dtype carrier only for the db2 cotangent (see _fused_mlp_bwd)
    b, n, d = x.shape
    f = w1.shape[1]
    r = b * n
    r_pad = _round_up(r, block_r)

    def rows(a, w):
        a = a.reshape(r, w)
        if r_pad != r:
            a = jnp.pad(a, ((0, r_pad - r), (0, 0)))
        return a

    row2 = lambda a: a.reshape(1, -1)
    rowspec = pl.BlockSpec((block_r, d), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    zspec = pl.BlockSpec((block_r, f), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    const = lambda *shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    ds, dw1, db1, dw2, db2, dls1, dlb1, dls2, dlb2 = pl.pallas_call(
        functools.partial(
            _postnorm_tail_bwd_kernel, eps=eps, activation=activation,
        ),
        grid=(r_pad // block_r,),
        in_specs=[
            rowspec, rowspec, rowspec, zspec, rowspec,
            const(1, d), const(1, d),
            const(d, f), const(f, d),
            const(1, d), const(1, d),
        ],
        out_specs=(
            rowspec,
            const(d, f), const(1, f), const(f, d), const(1, d),
            const(1, d), const(1, d), const(1, d), const(1, d),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r_pad, d), x.dtype),
            jax.ShapeDtypeStruct((d, f), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
            jax.ShapeDtypeStruct((f, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * r_pad * d * f,
            bytes_accessed=(4 * r_pad * d + r_pad * f + 2 * d * f)
            * x.dtype.itemsize + 2 * d * f * 4,
            transcendentals=2 * r_pad * f,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(rows(x, d), rows(attn_out, d), rows(g, d), rows(z, f),
      rows(s2, d), row2(ln1_s), row2(ln1_b), w1, w2,
      row2(ln2_s), row2(ln2_b))

    cast = lambda a, like: a.reshape(like.shape).astype(like.dtype)
    dsum = ds[:r].reshape(b, n, d)
    return (
        dsum, dsum,
        cast(dls1, ln1_s), cast(dlb1, ln1_b),
        cast(dw1, w1), cast(db1, b1),
        cast(dw2, w2), cast(db2, b2 if b2 is not None else w2[0]),
        cast(dls2, ln2_s), cast(dlb2, ln2_b),
    )


def postnorm_tail_xla(
    x, attn_out, ln1_s, ln1_b, w1, b1, w2, b2, ln2_s, ln2_b,
    eps: float = 1e-5, activation: str = "relu",
):
    """Unfused torch-parity formula (flax LayerNorm/Dense semantics);
    the differentiated forward of the custom VJP and the CPU path."""
    x2 = _ln_fp32(x + attn_out, ln1_s, ln1_b, eps)
    h = (x2 @ w1 + b1.astype(x.dtype)).astype(x.dtype)
    h = jax.nn.relu(h) if activation == "relu" else jax.nn.gelu(
        h, approximate=False
    )
    y = (h @ w2 + b2.astype(x.dtype)).astype(x.dtype)
    return _ln_fp32(x2 + y, ln2_s, ln2_b, eps)


def postnorm_tail_fits(
    d: int, f: int, itemsize: int, block_r: int = 256,
    save_acts: bool = False,
) -> bool:
    """VMEM gate for :func:`fused_postnorm_tail` — unlike
    :func:`fused_mlp_fits` it accounts for TWO streamed row inputs
    (x and attn_out) and the extra fp32 row temporaries (s1, x2f, s2)
    the two LayerNorms keep live.  With ``save_acts`` (the training
    forward) z and the pre-LN2 sum are also streamed out."""
    weights = 2 * (2 * d * f * itemsize)
    tiles = 6 * block_r * d * itemsize  # x + attn_out + out, dbl-buf
    hidden = block_r * f * 4 + block_r * f * itemsize
    if save_acts:
        hidden += 2 * (block_r * f + block_r * d) * itemsize
    ln_tmp = 4 * block_r * d * 4  # s1/x2f + s2/o fp32 pairs
    return weights + tiles + hidden + ln_tmp <= 0.6 * _VMEM_LIMIT


def postnorm_tail_bwd_fits(
    d: int, f: int, itemsize: int, block_r: int = 256
) -> bool:
    """VMEM gate for :func:`_postnorm_tail_bwd`, which has a larger
    working set than the plain-MLP backward it's derived from: FIVE
    streamed row inputs (x, attn_out, g, z, s2) + the ds output, two
    LayerNorms' worth of fp32 row temporaries, and the same fp32 dW
    accumulators."""
    weights = 2 * (2 * d * f * itemsize)        # w1 + w2, dbl-buffered
    accums = 2 * d * f * 4 + f * 4 + 5 * d * 4  # dW1/dW2 + bias/LN vecs
    tiles = 10 * block_r * d * itemsize  # x/a/g/s2 in + ds out, dbl-buf
    hidden = (2 * block_r * f * itemsize  # z streamed, dbl-buffered
              + 3 * block_r * f * 4)      # z / dh / dz fp32
    row_tmp = 8 * block_r * d * 4  # s1/xhat1/x2/dx2/dxh/dxf + LN2 pair
    return weights + accums + tiles + hidden + row_tmp <= 0.6 * _VMEM_LIMIT


def _tail_train_pallas(train_impl: str, d: int, f: int, itemsize: int,
                       interpret: bool) -> bool:
    """Trace-time choice of the postnorm-tail training rule — same
    policy as :func:`_mlp_train_pallas` but gated on the TAIL kernels'
    own footprints (backward working set + save_acts forward streams),
    not the plain-MLP model (they diverge near the VMEM envelope)."""
    if train_impl == "pallas":
        return True
    if train_impl != "auto":
        return False
    on_tpu = jax.default_backend() == "tpu"
    return (
        (on_tpu or interpret)
        and d % 128 == 0 and f % 128 == 0
        and postnorm_tail_bwd_fits(d, f, itemsize)
        and postnorm_tail_fits(d, f, itemsize, save_acts=True)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13))
def fused_postnorm_tail(
    x: jnp.ndarray,
    attn_out: jnp.ndarray,
    ln1_s: jnp.ndarray,
    ln1_b: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    ln2_s: jnp.ndarray,
    ln2_b: jnp.ndarray,
    eps: float = 1e-5,
    activation: str = "relu",
    interpret: bool = False,
    train_impl: str = "auto",
) -> jnp.ndarray:
    """``LN2(LN1(x+attn) + fc2(act(fc1(LN1(x+attn)))))`` as ONE kernel.

    Under differentiation (``train_impl='auto'`` on TPU) the forward IS
    this kernel saving z + the pre-LN2 sum, and the backward is the
    companion Pallas kernel (:func:`_postnorm_tail_bwd`: 4 GEMMs, no
    recompute GEMMs — family A trains on the same fast path it serves).
    ``train_impl='xla'`` restores the round-2 rule (differentiate
    :func:`postnorm_tail_xla`).  Gate call sites on
    :func:`postnorm_tail_fits` (two streamed inputs + extra fp32 LN
    temporaries vs the plain MLP kernel).
    """
    return _postnorm_tail(
        x, attn_out, ln1_s, ln1_b, w1, b1, w2, b2, ln2_s, ln2_b,
        eps=eps, activation=activation, interpret=interpret,
    )


def _pt_fwd(x, attn_out, ln1_s, ln1_b, w1, b1, w2, b2, ln2_s, ln2_b,
            eps, activation, interpret, train_impl):
    d, f = w1.shape
    if _tail_train_pallas(train_impl, d, f, x.dtype.itemsize, interpret):
        out, z, s2 = _postnorm_tail(
            x, attn_out, ln1_s, ln1_b, w1, b1, w2, b2, ln2_s, ln2_b,
            eps=eps, activation=activation, interpret=interpret,
            save_acts=True,
        )
        return out, (x, attn_out, ln1_s, ln1_b, w1, b1, w2, b2,
                     ln2_s, ln2_b, z, s2)
    out, vjp = jax.vjp(
        lambda *a: postnorm_tail_xla(
            *a, eps=eps, activation=activation
        ),
        x, attn_out, ln1_s, ln1_b, w1, b1, w2, b2, ln2_s, ln2_b,
    )
    return out, vjp


def _pt_bwd(eps, activation, interpret, train_impl, res, g):
    if callable(res):  # XLA rule
        return res(g)
    (x, attn_out, ln1_s, ln1_b, w1, b1, w2, b2, ln2_s, ln2_b,
     z, s2) = res
    return _postnorm_tail_bwd(
        x, attn_out, g, z, s2, ln1_s, ln1_b, w1, b1, w2, ln2_s, ln2_b,
        eps=eps, activation=activation, interpret=interpret, b2=b2,
    )


fused_postnorm_tail.defvjp(_pt_fwd, _pt_bwd)
