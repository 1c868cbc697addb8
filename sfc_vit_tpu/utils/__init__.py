"""Utilities: torch interop, config, registries."""

from . import profiling, torch_compat

__all__ = ["profiling", "torch_compat"]
