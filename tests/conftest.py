"""Test harness config: force an 8-device virtual CPU mesh.

Multi-device sharding tests run on fake CPU devices (the standard JAX
trick; SURVEY.md section 4 item 4).  Must run before jax initializes.
"""

import os

# Force CPU: the ambient environment pins jax to the real TPU ("axon")
# via a sitecustomize hook that overrides JAX_PLATFORMS programmatically,
# so we must set the config knob, not just the env var.  Unit tests run
# hermetically on the virtual CPU mesh; TPU-hardware tests opt back in
# via the SFC_VIT_TPU_TESTS=1 env var.
_ON_TPU = bool(os.environ.get("SFC_VIT_TPU_TESTS"))
if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import pathlib

import jax
import numpy as np
import pytest

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"


@pytest.fixture(scope="session")
def golden():
    """Golden vectors extracted once from the reference implementation."""
    return np.load(GOLDEN_DIR / "curves_golden.npz")
