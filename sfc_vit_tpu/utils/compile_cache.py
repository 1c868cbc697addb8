"""Persistent XLA compilation cache.

On this deployment's remote TPU backend a cold ViT-B-sized compile
costs 5-20 minutes of wall clock (every HLO->executable round trip goes
over the tunnel); the reference pays the analogous torch.compile /
cuDNN-autotune warmup on every fresh process with no persistence story
(``/root/reference/main.py`` has none).  jax ships a content-addressed
persistent cache keyed by (HLO, compile options, backend version) —
this module is the one-call opt-in the CLI (``--compile-cache DIR``)
and :class:`~sfc_vit_tpu.serving.ServingEngine` (``compile_cache=``)
route through.

The cache is safe to share between processes (entries are written
atomically under a content hash) and invalidates itself on backend or
jaxlib version changes.  It is OPT-IN because the default cache dir
would otherwise surprise users with unbounded growth in ``~/.cache``.
"""

from __future__ import annotations

import os
from typing import Optional, Union


def enable_compile_cache(
    cache_dir: Union[str, os.PathLike],
    *,
    min_compile_seconds: float = 1.0,
    min_entry_bytes: int = 0,
) -> str:
    """Turn on the persistent compilation cache at ``cache_dir``.

    Idempotent; creates the directory.  ``min_compile_seconds`` skips
    persisting trivial programs (jax's default 1.0 s keeps the cache
    from filling with broadcast/convert one-liners); lower it to 0.0
    to persist everything (tests do).  Returns the absolute path.

    The cache is PROCESS-GLOBAL jax config: enabling it affects every
    later compile in the process (training, other engines), and
    re-enabling with a different directory repoints them all — a
    warning is emitted when that happens.
    """
    import warnings

    import jax

    path = os.path.abspath(os.fspath(cache_dir))
    current = jax.config.jax_compilation_cache_dir
    if current and os.path.abspath(current) != path:
        warnings.warn(
            f"repointing the process-global compilation cache from "
            f"{current} to {path}: all later compiles in this process "
            f"(other engines, training) now cache there",
            stacklevel=2,
        )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_enable_compilation_cache", True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs",
        float(min_compile_seconds),
    )
    jax.config.update(
        "jax_persistent_cache_min_entry_size_bytes", int(min_entry_bytes)
    )
    return path


def compile_cache_stats(cache_dir: Union[str, os.PathLike]) -> dict:
    """Entry count + total bytes of a cache directory (0s if absent)."""
    path = os.fspath(cache_dir)
    if not os.path.isdir(path):
        return {"entries": 0, "bytes": 0}
    entries = 0
    total = 0
    for name in os.listdir(path):
        full = os.path.join(path, name)
        if os.path.isfile(full):
            entries += 1
            total += os.path.getsize(full)
    return {"entries": entries, "bytes": total}
