"""Utilities: torch interop, profiling, compile cache."""

from . import compile_cache, profiling, torch_compat
from .compile_cache import compile_cache_stats, enable_compile_cache

__all__ = [
    "compile_cache",
    "compile_cache_stats",
    "enable_compile_cache",
    "profiling",
    "torch_compat",
]
