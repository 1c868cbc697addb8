"""Profiling and observability hooks (SURVEY.md section 5 "tracing").

The reference has none (tqdm bars only); here:
  * :func:`trace` -- context manager around ``jax.profiler`` emitting a
    TensorBoard-loadable trace directory.
  * :func:`annotate` -- named trace spans for host-side phases.
  * :func:`attention_maps` -- run a model capturing per-head attention
    weights (the capability the reference left commented out at
    ``vit.py:48-174``).
"""

from __future__ import annotations

import contextlib
from typing import Any, Dict

import jax

__all__ = ["trace", "annotate", "attention_maps", "attention_rows"]


@contextlib.contextmanager
def trace(logdir: str):
    """Profile the enclosed block: ``with trace('/tmp/prof'): step(...)``.

    View with TensorBoard or xprof pointed at ``logdir``.  (Memory
    capture is always on in ``jax.profiler.start_trace`` -- there is no
    toggle to expose.)
    """
    jax.profiler.start_trace(logdir, create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span context: ``with annotate('eval-epoch'): ...``."""
    return jax.profiler.TraceAnnotation(name)


def attention_maps(
    model, variables: Dict[str, Any], x, **apply_kwargs
) -> Dict[str, Any]:
    """Forward the model and return {'logits', 'attention'} where
    'attention' maps module paths to per-head [B, H, N, N] weights.

    Works for every model in this framework: attention modules sow their
    weights whenever the 'intermediates' collection is mutable.
    """
    logits, state = model.apply(
        variables, x, mutable=["intermediates"], **apply_kwargs
    )
    maps = {}
    flat = jax.tree_util.tree_flatten_with_path(
        state.get("intermediates", {})
    )[0]
    stats: Dict[str, Dict[str, Any]] = {}
    for path, leaf in flat:
        name = "/".join(
            getattr(p, "key", str(p)) for p in path
        )
        if "attention_weights" in name:
            maps[name] = leaf
        else:
            # long-sequence kernel-stats capture: attention_lse/q/k
            # sown per module (see models/simple_vit._PreNormAttention)
            for part in ("attention_lse", "attention_q", "attention_k"):
                if part in name:
                    prefix = name.split("/" + part)[0]
                    stats.setdefault(prefix, {})[
                        part.removeprefix("attention_")
                    ] = leaf
    out = {"logits": logits, "attention": maps}
    if stats:
        out["attention_stats"] = stats
    return out


def attention_rows(q, k, lse, queries, scale=None):
    """Reconstruct selected attention-weight ROWS from kernel stats.

    Args:
        q, k: ``[B, N, H, Dh]`` (as sown by the capture path; a tuple
            from flax ``sow`` is unwrapped).
        lse: ``[B, H, N]`` per-query log-sum-exp from the flash kernel.
        queries: int index array ``[R]`` — which query rows to build.

    Returns:
        ``[B, H, R, N]`` rows of the softmax attention matrix — exactly
        ``softmax(q k^T * scale)[queries]`` but in O(R * N) instead of
        O(N^2) memory, and numerically anchored to the production
        kernel's own LSE (so it observes what the kernel computed, not
        an XLA recompute).
    """
    import jax.numpy as jnp

    unwrap = lambda a: a[0] if isinstance(a, (tuple, list)) else a
    q, k, lse = unwrap(q), unwrap(k), unwrap(lse)
    dh = q.shape[-1]
    s = dh ** -0.5 if scale is None else scale
    queries = jnp.asarray(queries)
    qs = q[:, queries].astype(jnp.float32)          # [B, R, H, Dh]
    logits = jnp.einsum(
        "brhd,bnhd->bhrn", qs, k.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ) * s
    return jnp.exp(logits - lse[:, :, queries][..., None])
