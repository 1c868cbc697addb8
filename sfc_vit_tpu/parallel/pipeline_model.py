"""Pipeline parallelism as a MODEL PATH (round 3).

Round 2 left :func:`~sfc_vit_tpu.parallel.pipeline.pipeline_apply` as a
standalone utility; this module integrates it the way sequence
parallelism was integrated — reachable from ``Trainer`` / ``cli.py``
(``--pipeline-parallel N``) and exercised by ``dryrun_multichip``.

Design (TPU-first): the pre-norm ViT families (SimpleViT / CurveViT,
``altvit.py:163-268`` semantics) split as

    embed (replicated)  ->  S pipeline stages of depth/S encoder
    layers each (params stacked on a leading stage axis, sharded
    P('pipe'))  ->  head = final LN + mean pool + linear (replicated)

The embed/head are tiny (patch projection + classifier); all depth
lives in the stages, so each device holds 1/S of the transformer
parameters and their Adam mirrors — the memory axis PP exists for.
Microbatches stream through the stage ring via ``pipeline_apply``
(ppermute over ICI inside one ``lax.scan``); a ``(data, pipe)`` mesh
composes PP with batch sharding.

Parameter layout conversion is lossless and round-trips exactly
(:func:`split_pipeline_params` / :func:`merge_pipeline_params`; the
TrainState-level :func:`split_pipeline_state` / :func:`merge_pipeline_state`
also convert the Adam mirrors), so sequential checkpoints load into
pipelined runs and vice versa — ``Trainer.maybe_resume`` detects the
saved layout from the checkpoint metadata and converts automatically.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .pipeline import pipeline_apply, stack_stage_params

__all__ = [
    "split_pipeline_params",
    "merge_pipeline_params",
    "split_pipeline_state",
    "merge_pipeline_state",
    "make_pipelined_apply",
    "pipeline_state_sharding",
]


def _check_model(model):
    from ..models.simple_vit import CurveViT, SimpleViT

    if not isinstance(model, (SimpleViT, CurveViT)):
        raise TypeError(
            "pipeline parallelism supports the pre-norm ViT families "
            f"(SimpleViT / CurveViT); got {type(model).__name__}"
        )
    if getattr(model, "pool_layers", ()) or getattr(model, "merge_layers", ()):
        raise ValueError(
            "pipeline stages must preserve activation shape; disable "
            "pool_layers / merge_layers under --pipeline-parallel"
        )


def split_pipeline_params(params, depth: int, n_stages: int):
    """Sequential param tree -> ``{"outer": ..., "stages": stacked}``.

    ``outer`` is the sequential tree minus the per-layer ``attn_i`` /
    ``ff_i`` subtrees (embedding, final norm, head); ``stages`` stacks
    the per-stage subtrees (stage-local names ``attn_0..``) on a new
    leading axis of size ``n_stages``.
    """
    if depth % n_stages != 0:
        raise ValueError(f"depth {depth} not divisible by {n_stages} stages")
    k = depth // n_stages
    tr = dict(params["transformer"])
    stages = []
    for s in range(n_stages):
        st = {}
        for i in range(k):
            st[f"attn_{i}"] = tr.pop(f"attn_{s * k + i}")
            st[f"ff_{i}"] = tr.pop(f"ff_{s * k + i}")
        stages.append(st)
    outer = dict(params)
    outer["transformer"] = tr  # final 'norm' (and nothing else) stays
    return {"outer": outer, "stages": stack_stage_params(stages)}


def merge_pipeline_params(pp_params, depth: int, n_stages: int):
    """Inverse of :func:`split_pipeline_params` (exact round-trip)."""
    k = depth // n_stages
    tr = dict(pp_params["outer"]["transformer"])
    stages = pp_params["stages"]
    for s in range(n_stages):
        one = jax.tree_util.tree_map(lambda a, _s=s: a[_s], stages)
        for i in range(k):
            tr[f"attn_{s * k + i}"] = one[f"attn_{i}"]
            tr[f"ff_{s * k + i}"] = one[f"ff_{i}"]
    full = dict(pp_params["outer"])
    full["transformer"] = tr
    return full


def _map_param_mirrors(tree, src_treedef, fn):
    """Apply ``fn`` to every subtree of ``tree`` whose pytree structure
    equals ``src_treedef`` (the param-tree layout).  This converts the
    Adam mu/nu mirrors inside an optax state without knowing the chain's
    exact shape — any transform that mirrors the param tree is caught."""

    def rec(node):
        if jax.tree_util.tree_structure(node) == src_treedef:
            return fn(node)
        if isinstance(node, tuple) and hasattr(node, "_fields"):
            return type(node)(*[rec(c) for c in node])
        if isinstance(node, tuple):
            return tuple(rec(c) for c in node)
        if isinstance(node, list):
            return [rec(c) for c in node]
        if isinstance(node, dict):
            return {k: rec(v) for k, v in node.items()}
        return node

    return rec(tree)


def split_pipeline_state(state, depth: int, n_stages: int):
    """Sequential TrainState -> pipelined layout: converts ``params``
    and every opt-state subtree that mirrors it (Adam mu/nu) with
    :func:`split_pipeline_params` — lossless, so sequential checkpoints
    load into pipelined runs with their optimizer moments intact."""
    fn = lambda p: split_pipeline_params(p, depth, n_stages)
    src = jax.tree_util.tree_structure(state.params)
    return state.replace(
        params=fn(state.params),
        opt_state=_map_param_mirrors(state.opt_state, src, fn),
    )


def merge_pipeline_state(state, depth: int, n_stages: int):
    """Inverse of :func:`split_pipeline_state` (exact round-trip)."""
    fn = lambda p: merge_pipeline_params(p, depth, n_stages)
    src = jax.tree_util.tree_structure(state.params)
    return state.replace(
        params=fn(state.params),
        opt_state=_map_param_mirrors(state.opt_state, src, fn),
    )


def _embed(model, outer, x, rngs=None):
    """Everything before the encoder stack, reusing the model's own
    submodules with their sequential param subtrees (SimpleViT
    ``altvit.py:171-186`` / CurveViT ``altvit.py:215-240`` prefixes;
    parity pinned by tests)."""
    from ..curves import flat_lut
    from ..models.posemb import gfpe, sincos_1d
    from ..models.simple_vit import CurvePatchEmbedding, CurveViT
    from ..tokenizers.embeddings import patchify

    dt = model.dtype
    if isinstance(model, CurveViT):
        tokens = CurvePatchEmbedding(
            image_size=model.image_size, patch_size=model.patch_size,
            dim=model.dim, curve=model.curve, dtype=dt,
        ).apply({"params": outer["to_patch_embedding"]}, x, rngs=rngs)
        grid = model.image_size // model.patch_size
        positions = flat_lut(model.curve, grid).astype(np.float32)
        pe = gfpe(positions, model.dim, temperature=model.temperature,
                  h_param=model.h_param)
        return tokens + jnp.asarray(pe, dtype=tokens.dtype)
    n = (model.image_size // model.patch_size) ** 2
    t = patchify(x, model.patch_size)
    t = nn.LayerNorm(epsilon=1e-5, dtype=dt).apply(
        {"params": outer["norm_in"]}, t
    )
    t = nn.Dense(model.dim, dtype=dt).apply({"params": outer["proj"]}, t)
    t = nn.LayerNorm(epsilon=1e-5, dtype=dt).apply(
        {"params": outer["norm_out"]}, t
    )
    return t + jnp.asarray(sincos_1d(n, model.dim), dtype=t.dtype)


def _head(model, outer, tokens):
    """Final LN (the sequential stack's ``transformer/norm``) + mean
    pool + linear head."""
    dt = model.dtype
    t = nn.LayerNorm(epsilon=1e-5, dtype=dt).apply(
        {"params": outer["transformer"]["norm"]}, tokens
    )
    t = t.mean(axis=1)
    return nn.Dense(model.num_classes, dtype=dt).apply(
        {"params": outer["linear_head"]}, t
    )


def make_pipelined_apply(
    model,
    mesh: Mesh,
    n_stages: int,
    microbatches: int,
    axis: str = "pipe",
    batch_axis: Optional[str] = "data",
) -> Callable:
    """Build an ``apply_fn(variables, x, deterministic=..., rngs=...)``
    drop-in for ``model.apply`` whose params use the pipelined layout
    (:func:`split_pipeline_params`) and whose encoder runs as a GPipe
    microbatch ring over ``mesh.shape[axis]`` stages.

    Plug it into ``TrainState.apply_fn`` and the standard train/eval
    steps work unchanged.
    """
    _check_model(model)
    if model.depth % n_stages != 0:
        raise ValueError(
            f"depth {model.depth} not divisible by {n_stages} stages"
        )
    if mesh.shape[axis] != n_stages:
        raise ValueError(
            f"mesh axis {axis!r} has size {mesh.shape[axis]}, "
            f"expected {n_stages}"
        )
    from ..models.simple_vit import PreNormTransformer

    attn_impl = model.attn_impl
    if not isinstance(attn_impl, str):
        # every stage reuses ONE stacked stage module, so a per-layer
        # schedule would need identical per-stage slices; collapse a
        # uniform tuple, reject a genuinely mixed one
        uniq = set(attn_impl)
        if len(uniq) != 1:
            raise ValueError(
                "pipeline parallelism stacks identical stages; a mixed "
                f"per-layer attn_impl schedule {attn_impl!r} "
                "cannot be split -- use a single implementation"
            )
        attn_impl = next(iter(uniq))

    stage_mod = PreNormTransformer(
        dim=model.dim, depth=model.depth // n_stages, heads=model.heads,
        dim_head=model.dim_head, mlp_dim=model.mlp_dim,
        remat=model.remat, dtype=model.dtype, attn_impl=attn_impl,
        final_norm=False,
    )

    def stage_fn(stage_params, act):
        return stage_mod.apply({"params": stage_params}, act)

    def apply_fn(variables, x, deterministic: bool = True, rngs=None):
        del deterministic  # family has no dropout (altvit semantics)
        pp = variables["params"]
        outer, stages = pp["outer"], pp["stages"]
        tokens = _embed(model, outer, x, rngs=rngs)
        b, n, d = tokens.shape
        bshard = (batch_axis if batch_axis
                  and mesh.shape.get(batch_axis, 1) > 1 else None)
        # The batch must split into `microbatches` equal microbatches,
        # each divisible by the data mesh axis.  Ragged batches (the
        # final eval batch under drop_last=False, or a CLI batch size
        # that doesn't match the pipe geometry) are padded up — pad
        # rows' logits are sliced off below, so loss/grads on real
        # rows are identical to an unpadded run.
        quantum = microbatches * (mesh.shape[bshard] if bshard else 1)
        b_pad = -(-b // quantum) * quantum
        if b_pad != b:
            tokens = jnp.pad(
                tokens, ((0, b_pad - b), (0, 0), (0, 0))
            )
        mb = b_pad // microbatches
        # STRIDED microbatch split (microbatch m = rows m::M): every
        # microbatch takes an equal slice of each device's contiguous
        # row block under the 'data' sharding, so the reshape/transpose
        # are device-local.  A contiguous reshape(M, mb, ...) would put
        # whole microbatches on single devices and force GSPMD to
        # all-to-all the full activation into P(None, 'data') every
        # step (same reasoning as the grad-accum split in
        # training/steps.py).  Per-row compute is batch-independent, so
        # regrouping changes no row's logits.
        xs = tokens.reshape(mb, microbatches, n, d).transpose(1, 0, 2, 3)
        ys = pipeline_apply(
            mesh, stage_fn, stages, xs, axis=axis, batch_axis=bshard,
        )
        out = ys.transpose(1, 0, 2, 3).reshape(b_pad, n, d)
        return _head(model, outer, out)[:b]

    return apply_fn


def pipeline_state_sharding(mesh: Mesh, state, axis: str = "pipe"):
    """NamedSharding pytree for a TrainState over pipelined params:
    every leaf whose tree path passes through a ``stages`` key is
    sharded ``P(axis)`` on its leading (stage) axis; everything else
    (embed/head params, their Adam mirrors, step) replicates.  Works
    for the whole TrainState because optax state mirrors the param
    tree structure."""

    def sh(path, _leaf):
        keys = {
            getattr(p, "key", getattr(p, "name", None)) for p in path
        }
        spec = P(axis) if "stages" in keys else P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(sh, state)
