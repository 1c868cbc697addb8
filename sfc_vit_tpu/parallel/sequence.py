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

__all__ = ["sequence_parallel_attention"]


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
    """
    del implementation  # local math kept simple; flash slots in later
    dh = q.shape[-1]
    s = dh ** -0.5 if scale is None else scale

    def local(qb, kb, vb):
        kg = jax.lax.all_gather(kb, axis, axis=1, tiled=True)
        vg = jax.lax.all_gather(vb, axis, axis=1, tiled=True)
        return dot_product_attention_xla(qb, kg, vg, s)

    spec = P(None, axis, None, None)
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)
