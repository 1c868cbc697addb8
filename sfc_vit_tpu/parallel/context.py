"""Ambient sequence-parallel context.

Models route attention through ``ops.attention.multi_head_attention``
with a string ``attn_impl``; the ``'ring'`` and ``'sp'`` implementations
need a device mesh + axis name, which flax module attributes cannot
carry (meshes are unhashable).  This module provides the ambient
channel: wrap the training/eval call site in

    with sequence_sharding(mesh, axis="model"):
        state, metrics = jitted_step(...)

and every attention inside the traced model picks up the mesh and runs
sequence-parallel (the token axis sharded over ``axis``, ppermute-ring
or all-gather collectives over ICI).  Outside the context — or when the
axis has size 1, or the token count does not divide it — the same
``attn_impl`` degrades gracefully to the local XLA path, so a model
checkpointed with ``attn_impl='ring'`` still runs single-chip.

TPU-first rationale: this is the jax analogue of the reference's
process-group plumbing (it has none — SURVEY §2f marks SP absent
upstream); collectives are inserted by shard_map/XLA, not hand-written
NCCL.

Caveat (tracing-time switch): the context is consulted when jax traces
the function.  jit caches traces by function identity + abstract args,
so a step function traced *inside* the context keeps its collectives if
later called outside it (and vice versa).  Use distinct function
objects, or ``jitted.clear_cache()``, when switching modes.
"""

from __future__ import annotations

from contextlib import contextmanager
from contextvars import ContextVar
from typing import Optional, Tuple

from jax.sharding import Mesh

__all__ = ["sequence_sharding", "active_sequence_sharding"]

# ContextVar, not a module-global list: concurrent tracing threads
# (async eval, a second Trainer) would corrupt each other's stack and
# unwind pops out of order.
_ACTIVE: ContextVar[Optional[Tuple[Mesh, str]]] = ContextVar(
    "sfc_vit_tpu_sequence_sharding", default=None
)


@contextmanager
def sequence_sharding(mesh: Mesh, axis: str = "model"):
    """Activate sequence-parallel attention over ``mesh[axis]`` for the
    duration of the block (typically wrapping a jitted train/eval call
    so the tracing sees it)."""
    if axis not in mesh.shape:
        raise ValueError(
            f"mesh has no axis {axis!r}; axes: {tuple(mesh.shape)}"
        )
    token = _ACTIVE.set((mesh, axis))
    try:
        yield
    finally:
        _ACTIVE.reset(token)


def active_sequence_sharding() -> Optional[Tuple[Mesh, str]]:
    """The innermost active (mesh, axis), or None."""
    return _ACTIVE.get()
