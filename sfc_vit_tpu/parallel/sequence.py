"""Sequence-parallel attention via shard_map (long-context scaling).

The reference tops out at 1,024 pixel tokens on one GPU (SURVEY.md
section 5 "long-context").  For longer curve-ordered sequences this
module shards the token axis across the mesh's "model" axis:

* queries stay sharded (each device owns its token slice);
* K/V are all-gathered over ICI (one collective, overlapping with
  compute under XLA's scheduler);
* each device computes attention for its Q slice with any local
  implementation (flash kernel on TPU).

This is the standard DeepSpeed-Ulysses-style trade (gather K/V, shard
Q); a ring variant can replace the all-gather later without changing
the call site.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.attention import dot_product_attention_xla

__all__ = ["sequence_parallel_attention", "ring_attention"]


def _seq_spec(mesh: Mesh, axis: str, batch: int) -> P:
    """[B, N, H, Dh] spec: N over ``axis``, and B over the data axis
    when the mesh has one (and B divides it) — declaring B replicated
    while the caller's batch is sharded P('data') would force an
    all-gather over 'data' and make every data-group redundantly
    attend to the whole batch."""
    d = mesh.shape.get("data", 1)
    batch_ax = (
        "data" if axis != "data" and d > 1 and batch % d == 0 else None
    )
    return P(batch_ax, axis, None, None)


def ring_attention(
    mesh: Mesh,
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis: str = "model",
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Ring attention on [B, N, H, Dh] with N sharded over ``axis``.

    Memory-optimal sequence parallelism: K/V shards rotate around the
    ring via ``ppermute`` while each device folds one block per step
    into an online-softmax accumulator -- no device ever holds more than
    its own 1/P of K/V (unlike the all-gather variant), and the
    communication overlaps with the block computation under XLA's
    scheduler.  Exact same result as dense attention.
    """
    dh = q.shape[-1]
    s = dh ** -0.5 if scale is None else scale
    p = mesh.shape[axis]

    def local(qb, kb, vb):
        qf = qb.astype(jnp.float32)
        perm = [(i, (i + 1) % p) for i in range(p)]

        def fold(m, l, acc, kc, vc):
            logits = jnp.einsum(
                "bnhd,bmhd->bhnm", qf, kc.astype(jnp.float32)
            ) * s
            m_blk = jnp.max(logits, axis=-1)  # [B,H,N]
            m_new = jnp.maximum(m, m_blk)
            correction = jnp.exp(m - m_new)
            e = jnp.exp(logits - m_new[..., None])
            l_new = l * correction + jnp.sum(e, axis=-1)
            acc_new = acc * correction[..., None] + jnp.einsum(
                "bhnm,bmhd->bhnd", e, vc.astype(jnp.float32)
            )
            return m_new, l_new, acc_new

        def step(carry, _):
            # rotate FIRST, then fold: the resident block is folded
            # before the scan, so p-1 rotations total — a trailing
            # rotate-then-discard would cost 2 extra ICI collectives
            # per attention call (XLA cannot DCE collectives in a scan)
            m, l, acc, kc, vc = carry
            kc = jax.lax.ppermute(kc, axis, perm)
            vc = jax.lax.ppermute(vc, axis, perm)
            m, l, acc = fold(m, l, acc, kc, vc)
            return (m, l, acc, kc, vc), None

        b, n, h, _ = qb.shape
        # derive the accumulators from qb so shard_map types them as
        # varying over the ring axis (pvary), matching the loop outputs
        zeros = jnp.moveaxis(qf, 1, 2) * 0.0  # (b, h, n, dh)
        m0 = zeros[..., 0] - jnp.inf
        l0 = zeros[..., 0]
        acc0 = zeros
        m, l, acc = fold(m0, l0, acc0, kb, vb)
        if p > 1:
            (m, l, acc, _, _), _ = jax.lax.scan(
                step, (m, l, acc, kb, vb), None, length=p - 1
            )
        out = acc / l[..., None]
        return out.transpose(0, 2, 1, 3).astype(qb.dtype)

    spec = _seq_spec(mesh, axis, q.shape[0])
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)


def sequence_parallel_attention(
    mesh: Mesh,
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis: str = "model",
    scale: Optional[float] = None,
    implementation: str = "auto",
) -> jnp.ndarray:
    """Attention on [B, N, H, Dh] with N sharded over ``axis``.

    Returns output sharded identically to q.  N must divide the axis
    size.  Off-mesh (axis size 1) this degenerates to local attention.
    ``implementation`` selects the per-device math for the local
    Q-slice x gathered-K/V computation — note this is **cross**
    attention (K/V is ``p`` times longer than the Q slice): "pallas"
    forces the rectangular flash kernel (TPU), "xla"/"xla_bf16" the
    explicit formulas, and "auto" picks flash past the measured
    crossover (keyed on the gathered row width), bf16 softmax for
    short bf16 rows, fp32 otherwise.  "ring"/"local" selections fall
    back to "auto" (:func:`ring_attention` is the memory-optimal
    long-context choice — it never gathers full K/V).
    """
    dh = q.shape[-1]
    s = dh ** -0.5 if scale is None else scale
    if implementation not in ("xla", "xla_bf16", "pallas"):
        implementation = "auto"

    def local(qb, kb, vb):
        from ..ops.attention import (
            _PALLAS_MIN_N,
            _pallas_ok,
            dot_product_attention_bf16,
        )

        kg = jax.lax.all_gather(kb, axis, axis=1, tiled=True)
        vg = jax.lax.all_gather(vb, axis, axis=1, tiled=True)
        n_row = kg.shape[1]  # the softmax row width = full N
        on_tpu = jax.default_backend() == "tpu"
        if on_tpu and (
            implementation == "pallas"
            or (implementation == "auto" and _pallas_ok(n_row, dh))
        ):
            from ..ops.flash_attention import flash_attention

            return flash_attention(qb, kg, vg, scale=s)
        bf16_ok = (
            on_tpu
            and qb.dtype == jnp.bfloat16
            and n_row < _PALLAS_MIN_N
        )
        if implementation == "xla_bf16" or (
            implementation == "auto" and bf16_ok
        ):
            return dot_product_attention_bf16(qb, kg, vg, s)
        return dot_product_attention_xla(qb, kg, vg, s)

    spec = _seq_spec(mesh, axis, q.shape[0])
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)
