"""Driver contract: entry() compiles; dryrun_multichip(8) executes."""

import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")
import __graft_entry__ as ge


def test_entry_compiles_and_runs():
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 10)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip_8():
    assert len(jax.devices()) >= 8
    ge.dryrun_multichip(8)  # raises on failure


def test_dryrun_multichip_2():
    ge.dryrun_multichip(2)
