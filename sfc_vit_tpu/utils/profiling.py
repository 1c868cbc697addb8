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

__all__ = ["trace", "annotate", "attention_maps"]


@contextlib.contextmanager
def trace(logdir: str, with_memory: bool = True):
    """Profile the enclosed block: ``with trace('/tmp/prof'): step(...)``.

    View with TensorBoard or xprof pointed at ``logdir``.
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

    def collect(path, leaf):
        key = "/".join(str(p) for p in path)
        maps[key] = leaf

    flat = jax.tree_util.tree_flatten_with_path(
        state.get("intermediates", {})
    )[0]
    for path, leaf in flat:
        name = "/".join(
            getattr(p, "key", str(p)) for p in path
        )
        if "attention_weights" in name:
            maps[name] = leaf
    return {"logits": logits, "attention": maps}
