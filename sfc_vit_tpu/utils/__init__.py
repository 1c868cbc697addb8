"""Utilities: torch interop, config, registries."""

from . import torch_compat

__all__ = ["torch_compat"]
