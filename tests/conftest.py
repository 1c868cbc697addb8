"""Test harness config: force an 8-device virtual CPU mesh.

Multi-device sharding tests run on fake CPU devices (the standard JAX
trick; SURVEY.md section 4 item 4).  Must run before jax initializes.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import pathlib

import numpy as np
import pytest

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"


@pytest.fixture(scope="session")
def golden():
    """Golden vectors extracted once from the reference implementation."""
    return np.load(GOLDEN_DIR / "curves_golden.npz")
