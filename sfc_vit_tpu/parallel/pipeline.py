"""Pipeline parallelism: GPipe-style microbatch streaming over a mesh axis.

SURVEY §2f marks PP as unnecessary at ViT-B scale (the models fit one
chip with room to spare), so the reference has nothing to mirror — this
module exists so the framework scales past single-stage memory when a
future model family needs it, implemented the TPU way:

* stages live on a ``pipe`` mesh axis; every device holds ONLY its own
  stage's parameters (the stacked-stage tree is sharded ``P('pipe')``);
* microbatches stream through the ring with ``lax.ppermute`` — each
  pipeline tick every device applies its stage to the activation it
  holds and passes the result to the next stage over ICI;
* the whole schedule is one ``lax.scan`` inside ``shard_map`` under
  ``jit`` — no Python-level orchestration, XLA overlaps the permute
  with the next tick's compute;
* the classic GPipe bubble applies: S-1 of the M + S - 1 ticks per
  device are idle, so throughput efficiency is M / (M + S - 1).

Works under autodiff (ppermute/scan are differentiable), so a pipelined
training step backpropagates through the schedule ("1F1B-by-transpose":
the reverse pass streams gradients backwards through the same ring).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

__all__ = ["pipeline_apply", "stack_stage_params", "stage_sharding"]


def stack_stage_params(stage_params: list):
    """Stack S per-stage parameter trees on a new leading 'stage' axis
    (shard the result with :func:`stage_sharding` so each device holds
    one stage)."""
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *stage_params
    )


def stage_sharding(mesh: Mesh, tree, axis: str = "pipe"):
    """NamedSharding pytree putting the leading stage axis on ``axis``."""
    return jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P(axis)), tree
    )


def pipeline_apply(
    mesh: Mesh,
    stage_fn: Callable,
    stacked_params,
    x: jnp.ndarray,
    axis: str = "pipe",
    batch_axis: str | None = None,
) -> jnp.ndarray:
    """Apply ``S = mesh.shape[axis]`` chained stages to ``x`` in pipeline.

    Args:
        stage_fn: ``(params_one_stage, activation [mb, ...]) ->
            activation`` — the per-stage computation.  Every stage must
            preserve the activation shape (standard for transformer
            encoder blocks).
        stacked_params: pytree whose leaves have a leading stage axis of
            size S (see :func:`stack_stage_params`); sharded or not —
            the shard_map in_spec partitions it over ``axis``.
        x: ``[M, mb, ...]`` microbatches (M >= 1; more microbatches =
            smaller bubble).
        batch_axis: optional second mesh axis to shard the microbatch
            (dim 1) over — composes PP with data parallelism on a
            ``(data, pipe)`` mesh; the ring permutes over ``axis`` only.

    Returns:
        ``[M, mb, ...]`` outputs = stage_{S-1}(...stage_0(x)), identical
        to sequential application.
    """
    s = mesh.shape[axis]
    leading = {
        a.shape[0] for a in jax.tree_util.tree_leaves(stacked_params)
    }
    if leading != {s}:
        # shard_map only errors when S does NOT divide the axis size:
        # 8 stages on a 4-device pipe would silently apply stages
        # 0,2,4,6 and drop the rest (each device keeps params[0] of its
        # [S/axis, ...] block).
        raise ValueError(
            f"stacked_params lead with stage counts {sorted(leading)}, "
            f"but mesh axis {axis!r} has {s} devices — they must match "
            "exactly (restack with stack_stage_params(..., stages="
            f"{s}))"
        )
    m = x.shape[0]
    ticks = m + s - 1

    def local(params, xs):
        # params: [1, ...] (this device's stage); xs: [M, mb, ...]
        # (replicated input; only stage 0 consumes it).
        idx = jax.lax.axis_index(axis)
        p = jax.tree_util.tree_map(lambda a: a[0], params)
        fwd_perm = [(i, (i + 1) % s) for i in range(s)]

        mb_shape = xs.shape[1:]
        # the held-activation carry varies over the pipe axis (each
        # device holds different activations) — and over the batch axis
        # when the microbatch is data-sharded; mark the zero init as
        # varying so scan's type check accepts the ppermute outputs.
        varying = (axis,) + ((batch_axis,) if batch_axis else ())
        pad = jax.lax.pcast(
            jnp.zeros(mb_shape, xs.dtype), varying, to="varying"
        )

        def tick(held, t):
            # stage 0 ingests microbatch t (when one remains)...
            feed = jnp.where(t < m, t, 0)
            held = jnp.where(idx == 0, xs[feed], held)
            # ...every stage applies its block to what it holds...
            y = stage_fn(p, held)
            # ...and the ring rotates activations one stage forward.
            # y is ALSO emitted as this tick's scan output: on the last
            # stage, tick t >= S-1 is finished microbatch t - (S-1), so
            # the M real outputs are ys[S-1:].  Banking through scan's
            # ys writes each row exactly once — the previous carry-based
            # bank dragged the whole [M, mb, ...] buffer through every
            # tick's carry (double-buffered copies + a scatter per tick
            # on ALL S stages, TODO.md perf item).
            return jax.lax.ppermute(y, axis, fwd_perm), y

        _, ys = jax.lax.scan(tick, pad, jnp.arange(ticks))
        outs = ys[s - 1:]
        # Only the last stage computed real outputs; a masked psum
        # replicates them over the pipe axis (everyone else contributes
        # garbage zeroed by the mask).  A one-source broadcast would
        # halve the ICI bytes, but XLA has no broadcast-from collective
        # — masked psum is the idiomatic lowering.
        mask = (idx == s - 1).astype(outs.dtype)
        return jax.lax.psum(outs * mask, axis)

    xspec = P(None, batch_axis) if batch_axis else P()
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), xspec),
        out_specs=xspec,
    )
    return fn(stacked_params, x)
