"""Data-dependent curve token merging (static shapes, jit-safe).

ToMe-style token reduction specialized to curve order (the
neighbour-aware Hilbert token-reduction direction in PAPERS.md): curve-
adjacent token pairs are scored by cosine similarity and the ``k`` most
similar pairs are merged (averaged), the rest keep both tokens.  Curve
adjacency means merge candidates are spatial neighbours by construction,
so no global matching is needed -- scoring is O(N).

TPU mapping: everything is fixed-shape -- top-k over N/2 pair scores, a
dummy-slot compaction via stable argsort, and one gather.  Fully
differentiable (gradients flow through the gathers).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["curve_pair_merge_topk"]


def curve_pair_merge_topk(
    x: jnp.ndarray, merge_ratio: float = 0.5, eps: float = 1e-6
) -> jnp.ndarray:
    """Merge the most-similar curve-adjacent pairs: [B, N, D] -> [B, M, D]
    with M = N - k, k = floor(N/2 * merge_ratio).

    Curve order is preserved: a merged pair contributes one (averaged)
    token at its pair position; an unmerged pair keeps both tokens.
    """
    b, n, d = x.shape
    assert n % 2 == 0, f"token count {n} must be even to pair-merge"
    if not 0.0 <= merge_ratio <= 1.0:
        raise ValueError(
            f"merge_ratio must be in [0, 1], got {merge_ratio!r} "
            "(>1 would silently drop unmerged tokens, <0 silently no-op)"
        )
    p = n // 2
    k = int(p * merge_ratio)
    if k == 0:
        return x
    x0 = x[:, 0::2]  # [B, P, D]
    x1 = x[:, 1::2]

    def _norm(t):
        return t / (jnp.linalg.norm(t, axis=-1, keepdims=True) + eps)

    sim = jnp.sum(_norm(x0) * _norm(x1), axis=-1)  # [B, P]
    # merge exactly the k highest-similarity pairs (stable ranks break
    # ties by pair index, so the count is exact even with duplicates)
    order = jnp.argsort(-sim, axis=1, stable=True)
    rank = jnp.argsort(order, axis=1, stable=True)
    merge = rank < k  # [B, P]

    merged = 0.5 * (x0 + x1)
    slot_a = jnp.where(merge[..., None], merged, x0)  # always valid
    slot_b = x1  # valid only when not merged
    tokens = jnp.stack([slot_a, slot_b], axis=2).reshape(b, n, d)
    valid = jnp.stack(
        [jnp.ones_like(merge), ~merge], axis=2
    ).reshape(b, n)
    # stable compaction: valid tokens first, curve order preserved
    perm = jnp.argsort(~valid, axis=1, stable=True)  # [B, N]
    compacted = jnp.take_along_axis(tokens, perm[..., None], axis=1)
    return compacted[:, : n - k]
